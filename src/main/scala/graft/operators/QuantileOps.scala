package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group quantile thresholds via fixed-bin histograms.
  *
  * Spark's exact `percentile`/`percentile_disc` aggregates buffer every
  * value of a group in the agg state — O(group) executor memory, a
  * 20 TB-per-language OOM at corpus scale — and `approx_percentile`'s
  * sketch merge order is engine-specific, so its result can't be
  * hash-checked across engines. For a BOUNDED metric (quality scores,
  * ratios, anything in [lo, hi)) the classic distributed answer is a
  * histogram quantile:
  *
  *  1. bin each value into `bins` fixed-width buckets — one
  *     map-side-combinable count per (group, bin), reducing the input to
  *     ≤ groups × bins rows;
  *  2. a running sum over the TINY bin table (low-card partition over
  *     reduced input — the PrefixSumOps discipline) finds the smallest
  *     bin whose cumulative count reaches ceil(q * n).
  *
  * The threshold is exact to one bin width, integer-deterministic, and
  * every step after the first aggregation touches only the bin table.
  * The quantile is a fraction num/den in integers (e.g. 9/10), so the
  * rank test `cum >= ceil(num*n/den)` becomes `cum*den >= n*num` — for
  * integer cum that is an exact equivalence, and it carries no float.
  */
object QuantileOps {

  /** One row per group: (groupCols..., n, thr_bin, n_kept) where thr_bin
    * is the smallest bin with cumulative count >= ceil(num/den * n) and
    * n_kept counts the rows at or above it (cum is strictly increasing
    * over present bins, so the minimal qualifying bin and the minimal
    * qualifying `cum - cnt` coincide). `value` must lie in [lo, hi];
    * values at hi clamp into the last bin. Pick (lo, hi, bins) so the bin
    * width is a power of two when the oracle must mirror the binning —
    * power-of-two scaling is IEEE-exact, so `floor(v/width)` and
    * `floor(v * bins)` agree bit-for-bit across engines.
    */
  def histogramThreshold(df: DataFrame, groupCols: Seq[String], value: Column,
      lo: Double, hi: Double, bins: Int, num: Int, den: Int): DataFrame = {
    require(bins > 0 && num > 0 && den >= num && lo < hi)
    val part = groupCols.map(col)
    val width = (hi - lo) / bins
    val bin = least(floor((value - lit(lo)) / lit(width)), lit((bins - 1).toLong))
    val counts = df.select(part :+ bin.as("_qt_bin"): _*)
      .groupBy(part :+ col("_qt_bin"): _*)
      .agg(count(lit(1)).as("_qt_cnt"))
    val wCum = Window.partitionBy(part: _*).orderBy(col("_qt_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(part: _*)
    counts
      .withColumn("_qt_cum", sum("_qt_cnt").over(wCum))
      .withColumn("n", sum("_qt_cnt").over(wAll))
      .groupBy(part: _*)
      .agg(
        max(col("n")).as("n"),
        min(when(col("_qt_cum") * den >= col("n") * num, col("_qt_bin")))
          .as("thr_bin"),
        (max(col("n")) - min(when(col("_qt_cum") * den >= col("n") * num,
          col("_qt_cum") - col("_qt_cnt")))).as("n_kept"))
  }

  /** EXACT per-group `percentile_disc(num/den)` over an INTEGER-domain
    * value (counts, deviations, micro-unit scores): reduce to the
    * (group, value) frequency table first — one map-side-combinable
    * hash aggregate — then find the smallest value whose cumulative
    * frequency reaches ceil(num/den · n) with the integer
    * cross-multiplied rank test (`cum·den ≥ n·num`, no float). This is
    * [[histogramThreshold]] with the bins = the value domain itself, so
    * the answer is exact, not exact-to-a-bin; the window runs over the
    * REDUCED frequency table, whose size per group is the group's
    * DISTINCT-value count — the caller's scale contract (activity
    * counts and absolute deviations have domains bounded by the max
    * observation, not by the corpus).
    *
    * @return one row per group: (groupCols..., outCol)
    */
  def discreteQuantile(df: DataFrame, groupCols: Seq[String],
      valueCol: String, num: Int, den: Int, outCol: String): DataFrame = {
    require(num > 0 && den >= num)
    val part = groupCols.map(col)
    val counts = df.groupBy(part :+ col(valueCol): _*)
      .agg(count(lit(1)).as("_dq_cnt"))
    val wCum = Window.partitionBy(part: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(part: _*)
    counts
      .withColumn("_dq_cum", sum("_dq_cnt").over(wCum))
      .withColumn("_dq_n", sum("_dq_cnt").over(wAll))
      .groupBy(part: _*)
      .agg(min(when(col("_dq_cum") * den >= col("_dq_n") * num,
        col(valueCol))).as(outCol))
  }
}
