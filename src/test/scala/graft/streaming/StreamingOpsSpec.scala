package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkedAppend (X1) moves all rows in micro-batches, exactly once") {
    val base = Files.createTempDirectory("graft_stream").toString
    // three source files = three micro-batches (maxFilesPerTrigger=1)
    Seq(1, 2, 3).toDF("x").repartition(3)
      .write.parquet(s"$base/src")
    StreamingOps.chunkedAppend(spark, s"$base/src", s"$base/dst", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/dst").as[Int].collect().toSet == Set(1, 2, 3))
    // re-run with same checkpoint: no new batches, no duplicates
    StreamingOps.chunkedAppend(spark, s"$base/src", s"$base/dst", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/dst").count() == 3)
  }

  test("streamingLatestPerKey merges incrementally and matches the batch result") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.streamingLatestPerKey(spark, s"$dir/events.parquet",
        queryName = "graft_test_upsert", splits = 4)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val batch = graft.sources.Tables.events(spark, dir)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("windowedEventCounts aggregates a bounded stream in complete mode") {
    val dir = "/root/testdata/sf0.001"
    val out = StreamingOps.windowedEventCounts(spark, s"$dir/events.parquet", "1 day",
      queryName = "graft_test_stream")
    assert(out.count() > 0)
    assert(out.columns.toSeq ==
      Seq("window_start", "event_type", "n_events", "sum_value"))
  }
}
