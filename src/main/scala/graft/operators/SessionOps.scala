package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/session analytics over the `events` table (SURVEY §7.1 step 8).
  *
  * Gap-based sessionization as two window passes over a single
  * shuffle-by-user: (1) flag rows whose gap from the previous event
  * exceeds `gapSeconds`; (2) running sum of flags = session id. Both
  * windows share the same partitioning (user_id), so Catalyst plans ONE
  * exchange + one sort — the property that matters at 100 TB, where the
  * user_id shuffle is the only wide dependency.
  *
  * Ordering ties on `ts` are broken by `event_id` to keep session
  * assignment total-order deterministic (oracle-comparable).
  */
object SessionOps {

  def sessionize(events: DataFrame, gapSeconds: Double = 1800d): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // integer microseconds: exact, engine-portable comparison arithmetic
    val tsUs = unix_micros(col("ts"))
    val gapUs = (gapSeconds * 1e6).toLong
    events
      .withColumn("prev_ts", lag(tsUs, 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || tsUs - col("prev_ts") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Per-user session stats: session count and event count. */
  def sessionStats(events: DataFrame, gapSeconds: Double = 1800d): DataFrame =
    sessionize(events, gapSeconds)
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
}
