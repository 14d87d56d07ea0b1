package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine assumes.
  *
  * Design notes (100 TB target):
  *  - AQE on: runtime re-planning (skew-join splitting, dynamic shuffle
  *    partition coalescing) is the main defence against skew at scale.
  *  - `spark.sql.shuffle.partitions` defaults to the local core count here;
  *    on a real cluster this is overridden to ~2-3x total executor cores
  *    (AQE coalesces down, so over-provisioning is cheap).
  *  - UTC session timezone: deterministic timestamp semantics across
  *    engines (the DuckDB oracle compares naive-UTC values).
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
