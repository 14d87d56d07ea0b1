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

  /** Theil–Sen robust trend estimator (Theil 1950, Sen 1968) over a
    * BOUNDED integer series — the monitoring-grade slope that one
    * outlier month cannot drag the way it drags tx18's OLS: slope =
    * median of all pairwise slopes, intercept = median of per-point
    * residuals under that slope.
    *
    * Bounded-series contract (mirrors kCenterCoreset's style of
    * explicit scale bounds): the input must already be an AGGREGATED
    * series — one row per integer x, length bounded by something
    * physical (calendar months, histogram bins), never by corpus rows —
    * because the pairwise self-join is O(M²) and deliberately so; a few
    * hundred points is thousands of pairs on one executor. The series
    * is localCheckpointed once so the self-join reads it twice without
    * recompute.
    *
    * Determinism: each pairwise slope is nano-rounded
    * (`round((yj−yi)·10⁹/(xj−xi))` — the numerator stays under 2⁵³ for
    * any y below ~9·10⁶ per point, documented), the median is the LOWER
    * median (rank `(n+1) div 2` under a total order on (value, xi, xj)),
    * and the intercept residuals `y·10⁹ − slope_nano·x` are exact longs
    * — so both engines agree bit-for-bit.
    *
    * @return one row: [n_points, n_pairs, slope_nano, intercept_nano]
    */
  def theilSen(series: DataFrame, xCol: String, yCol: String): DataFrame = {
    val s = Exec.materializeForSelfJoin(
      series.select(col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y")))
    val pairs = s.select(col("_x").as("_xi"), col("_y").as("_yi"))
      .join(s.select(col("_x").as("_xj"), col("_y").as("_yj")),
        col("_xi") < col("_xj"))
      .select(col("_xi"), col("_xj"), expr(
        "cast(round((_yj - _yi) * 1000000000.0 / (_xj - _xi)) as bigint)")
        .as("_s"))
    val wS = Window.orderBy(col("_s"), col("_xi"), col("_xj"))
    val slope = pairs
      .withColumn("_rn", row_number().over(wS))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy()))
      .where(col("_rn") === expr("(_n + 1) div 2"))
      .select(col("_s").as("slope_nano"), col("_n").as("n_pairs"))
    val res = s.crossJoin(broadcast(slope))
      .select(col("slope_nano"), col("n_pairs"),
        (col("_y") * lit(1000000000L) - col("slope_nano") * col("_x")).as("_r"),
        col("_x"))
    val wR = Window.orderBy(col("_r"), col("_x"))
    res
      .withColumn("_rn", row_number().over(wR))
      .withColumn("_np", count(lit(1)).over(Window.partitionBy()))
      .where(col("_rn") === expr("(_np + 1) div 2"))
      .select(col("_np").cast("long").as("n_points"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("slope_nano"), col("_r").as("intercept_nano"))
  }
}
