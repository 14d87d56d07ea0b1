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

  /** Run a streaming DataFrame to completion (`AvailableNow`) through a
    * DISTRIBUTED parquet sink and read the result back. A memory sink
    * would collect every result row into driver RAM — O(result) driver
    * state, an OOM at scale (a stream-stream join's output is O(matching
    * pairs)); the file sink keeps writes on the executors, so the driver
    * holds only streaming progress metadata.
    *
    *  - `append`: the native parquet streaming sink (exactly-once via its
    *    `_spark_metadata` commit log).
    *  - `complete`: the whole result is re-emitted each batch, so
    *    `foreachBatch` overwrites the output dir — the write itself still
    *    runs distributed on the executors.
    *  - `update`: each batch appends its changed rows tagged with the
    *    batch id; the read-back keeps the latest row per `updateKeys`.
    */
  private[streaming] def runViaFileSink(df: DataFrame, mode: String,
      queryName: String, updateKeys: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val base = java.nio.file.Files.createTempDirectory(s"graft_sink_$queryName")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val writer = mode match {
      case "append" =>
        df.writeStream.outputMode("append").format("parquet")
          .option("path", out)
      case "complete" =>
        df.writeStream.outputMode("complete")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(out)
          }
      case "update" =>
        require(updateKeys.nonEmpty, "update mode needs updateKeys")
        df.writeStream.outputMode("update")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.withColumn("_batch_id", lit(batchId))
              .write.mode("append").parquet(out)
          }
    }
    val q = writer
      .option("checkpointLocation", ckpt)
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val result = spark.read.parquet(out)
    if (mode == "update") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(updateKeys.map(col): _*)
        .orderBy(col("_batch_id").desc)
      result.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn", "_batch_id")
    } else result
  }

  /** Tumbling-window count/sum by event_type over a bounded parquet
    * directory, run as a real streaming query (complete mode, parquet
    * read-back) and returned as a DataFrame. Window starts are
    * epoch-aligned, matching a batch `floor(epoch/window)` bucketing
    * exactly.
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
    runViaFileSink(agg, "complete", queryName)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
  }

  /** Streaming MERGE (upsert sink): maintain the latest row per key of a
    * stream in a parquet table, one incremental merge per micro-batch.
    *
    * Each batch unions the previous table state with the batch's rows
    * and keeps the top row per `user_id` by (ts, event_id) — writing a
    * NEW generation directory (`g<batchId>`) instead of overwriting the
    * directory being read, which is the classic self-overwrite deadlock
    * of lazy reads. The reduction is associative, so the final state is
    * identical for any batching of the input. The source is re-split
    * into `splits` files and streamed with `maxFilesPerTrigger=1` so the
    * merge path actually runs incrementally (several batches), not once.
    *
    * Scale: per-batch work is one shuffle of (table ∪ batch) on the key;
    * state lives in the parquet table, not driver or executor memory.
    * On a real deployment the two-generation dance is what Delta/Iceberg
    * MERGE does transactionally; this is the pattern with plain parquet.
    */
  def streamingLatestPerKey(spark: SparkSession, eventsPath: String,
      queryName: String = "graft_stream_upsert", splits: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = java.nio.file.Files.createTempDirectory(s"graft_upsert_$queryName")
    val src = base.resolve("src").toString
    spark.read.parquet(eventsPath).repartition(splits).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("user_id", "event_id", "ts")
    val genRoot = base.resolve("gen").toString
    def gen(i: Long) = s"$genRoot/g$i"
    var lastGen = -1L // foreachBatch runs sequentially on the driver
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val prev =
          if (lastGen < 0) batch.limit(0)
          else spark.read.parquet(gen(lastGen))
        prev.unionByName(batch)
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
          .write.mode("overwrite").parquet(gen(id))
        lastGen = id
      }
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(lastGen >= 0, "no micro-batch ran")
    spark.read.parquet(gen(lastGen))
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
