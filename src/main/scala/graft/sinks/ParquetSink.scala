package graft.sinks

import org.apache.spark.sql.DataFrame

/** Parquet sinks — reference ops K1/K2/K3 rebuilt on Spark's writer
  * (`/root/reference/crawler/src/utils/s3.py:37-63`).
  *
  * Differences from the reference, by design (SURVEY §7.3):
  *  - the reference's date-stamped *filename prefix* has no Spark writer
  *    knob; callers pass `runDatePartition` instead, which lands a
  *    `load_date=YYYYMMDD` partition directory — the warehouse idiom that
  *    also enables replace-by-partition reruns (fixing the reference's
  *    append-idempotency gap, SURVEY §2.4 note).
  *  - snappy compression is Spark's Parquet default, matching the
  *    reference's `compression='snappy'`.
  */
object ParquetSink {

  /** K1: dataset write with append/overwrite, optional partition columns,
    * and the reference's skip-empty guard (`s3.py:40`). Registers the
    * table in the session catalog when `tableName` is given (the Glue
    * analog), else writes path-only.
    */
  def writeDataset(df: DataFrame, path: String, mode: String = "overwrite",
      partitionCols: Seq[String] = Nil, tableName: Option[String] = None): Boolean = {
    if (df.isEmpty) return false // reference: "No data to load" no-op
    var w = df.write.mode(mode).format("parquet")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    tableName match {
      case Some(t) => w.option("path", path).saveAsTable(t)
      case None    => w.save(path)
    }
    true
  }

  /** K1 + row count in ONE pass: the row count rides the write itself via
    * an [[org.apache.spark.sql.Observation]] metric instead of a second
    * full `count()` scan over the input. The empty guard stays a limit-1
    * probe on the unobserved plan (so it cannot satisfy the observation
    * early); with a cached parent it reads one row at most.
    */
  def writeDatasetCounted(df: DataFrame, path: String, mode: String = "overwrite",
      partitionCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit}
    if (df.isEmpty) return 0L // reference: "No data to load" no-op
    val obs = Observation()
    var w = df.observe(obs, count(lit(1)).as("n")).write.mode(mode).format("parquet")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.save(path)
    obs.get("n").asInstanceOf[Long]
  }

  /** K2: single-file-style write to an exact directory (the reference
    * wrote one Parquet object; distributed Spark coalesces to one task —
    * only sane for small outputs, which is the K2 use case).
    */
  def writeSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** Bucketed catalog write: co-locates future joins/aggregations on
    * `bucketCol` — two tables bucketed the same way join with NO exchange
    * (verified in ParquetSinkSpec by plan inspection). At 100 TB this is
    * the difference between re-shuffling the fact table on every join and
    * shuffling once at write time.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** K3: path delete (the reference listed+deleted S3 objects; here the
    * Hadoop FileSystem handles any scheme).
    */
  def deletePath(df: DataFrame, path: String): Boolean = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, true)
  }
}
