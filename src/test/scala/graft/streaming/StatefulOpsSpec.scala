package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.SessionOps
import graft.sources.Tables

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming sessionization matches the batch operator on bounded input") {
    val dir = "/root/testdata/sf0.001"
    val streaming = StatefulOps.streamingSessionStats(spark, s"$dir/events.parquet",
        queryName = "graft_test_sessions")
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val batch = SessionOps.sessionStats(Tables.events(spark, dir))
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(streaming == batch)
  }

  test("streaming dedup emits each (user_id, ts) once") {
    val dir = "/root/testdata/sf0.001"
    val out = StatefulOps.streamingDedup(spark, s"$dir/events.parquet",
      Seq("user_id"), queryName = "graft_test_dedup")
    assert(out.count() == out.select("user_id", "ts").distinct().count())
    assert(out.count() > 0)
  }
}
