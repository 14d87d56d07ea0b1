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

  test("stream-stream interval join matches the batch interval join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streaming = StatefulOps.streamStreamIntervalJoin(spark,
        s"$dir/events.parquet", "click", "signup", 3600L,
        queryName = "graft_test_ssjoin")
      .select("c_id", "s_id").as[(Long, Long)].collect().toSet
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"),
        unix_micros(col("ts")).as("c_us"))
    val signups = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("su"),
        unix_micros(col("ts")).as("s_us"))
    val batch = clicks.join(signups,
        col("cu") === col("su") && col("c_us") >= col("s_us")
          && col("c_us") <= col("s_us") + 3600000000L)
      .select("c_id", "s_id").as[(Long, Long)].collect().toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }
}
