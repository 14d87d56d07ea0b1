package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SessionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap-based sessionization splits on >30min gaps, ties broken by event_id") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (2L, ts("2024-01-01 10:10:00"), 100L), // same session (10 min)
      (3L, ts("2024-01-01 11:00:00"), 100L), // new session (50 min gap)
      (4L, ts("2024-01-01 10:00:00"), 200L)) // other user
      .toDF("event_id", "ts", "user_id")
    val stats = SessionOps.sessionStats(events)
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    assert(stats == Seq((100L, 2L, 3L), (200L, 1L, 1L)))
  }

  test("exactly-30min gap does NOT split (strictly-greater semantics)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:30:00"), 1L))
      .toDF("event_id", "ts", "user_id")
    val stats = SessionOps.sessionStats(events).as[(Long, Long, Long)].head()
    assert(stats._2 == 1L)
  }
}
