package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface.
  *
  * The reference's execution model is chunked micro-batching with
  * per-chunk sink flushes (X1, `procedure_code.py:725-811`). Its idiomatic
  * Spark restatement is `Trigger.AvailableNow` micro-batches — bounded
  * input consumed as a stream, each batch durably committed before the
  * next starts, with checkpointed exactly-once progress (strictly stronger
  * than the reference's at-least-once append).
  */
object StreamingOps {

  /** FileStreamSource requires a directory; when given a single parquet
    * file, expose it through a temp-dir symlink.
    */
  private[streaming] def asSourceDir(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) path
    else {
      val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
      java.nio.file.Files.createSymbolicLink(dir.resolve(p.getFileName), p)
      dir.toString
    }
  }

  /** Tumbling-window count/sum by event_type over a bounded parquet
    * directory, run as a real streaming query (complete mode, memory
    * sink) and returned as a DataFrame. Window starts are epoch-aligned,
    * matching a batch `floor(epoch/window)` bucketing exactly.
    */
  def windowedEventCounts(spark: SparkSession, eventsPath: String,
      window: String = "6 hours", queryName: String = "graft_stream_agg"): DataFrame = {
    // ns-precision source: read nanos as long, floor to µs (see Tables.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = asSourceDir(eventsPath)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
  }

  /** X1 restated: append a bounded source to a parquet sink in durable
    * micro-batches via foreachBatch (per-chunk flush semantics).
    */
  def chunkedAppend(spark: SparkSession, srcPath: String, dstPath: String,
      checkpoint: String): Unit = {
    val schema = spark.read.parquet(srcPath).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) batch.write.mode("append").parquet(dstPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
