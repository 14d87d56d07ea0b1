package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified fixed-budget selection: apportion a GLOBAL row budget
  * across strata (largest-remainder / Hamilton method — the standard
  * seat-apportionment rule), then draw each stratum's share by
  * equidistant systematic selection under a caller-chosen total order.
  * Together they are the "build a 60-doc eval set that mirrors corpus
  * language shares" op: dp16's PPS draw fixes the per-group budget a
  * priori, THIS derives every group's budget from one global number.
  */
object StratifyOps {

  /** Largest-remainder apportionment of `budget` seats proportional to
    * `cCol`: every group gets floor(budget·c/C) seats, and the groups
    * with the largest remainders split what's left — the unique rule
    * that never strays more than one seat from exact proportionality
    * and hands out exactly `budget` seats (when budget ≤ C; a group's
    * seats may exceed its population when budget > C, and the
    * systematic draw then caps at the population).
    *
    * Scale shape: runs entirely over the REDUCED per-group table (one
    * row per stratum — languages, sources, domains: bounded), so the
    * whole-table windows here are the dp11 precedent (windows over a
    * reduced table are fine; windows over corpus rows are not).
    * Caller contract: `budget · max(c)` must fit in a long.
    *
    * @param counts one row per group: keyCols + `cCol` (group size > 0)
    * @return counts + `seats`
    */
  def largestRemainderSeats(counts: DataFrame, keyCols: Seq[String],
      cCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val wAll = Window.partitionBy(lit(1))
    val wRank = Window.partitionBy(lit(1))
      .orderBy(col("_lr_rem").desc +: keyCols.map(col(_).asc): _*)
    counts
      .withColumn("_lr_ctot", sum(col(cCol)).over(wAll))
      .withColumn("_lr_base", expr(s"(${budget}L * `$cCol`) div _lr_ctot"))
      .withColumn("_lr_rem", expr(s"(${budget}L * `$cCol`) % _lr_ctot"))
      .withColumn("_lr_left", lit(budget) - sum(col("_lr_base")).over(wAll))
      .withColumn("_lr_rr", row_number().over(wRank))
      .withColumn("seats",
        col("_lr_base") + when(col("_lr_rr") <= col("_lr_left"), 1L).otherwise(0L))
      .drop("_lr_ctot", "_lr_base", "_lr_rem", "_lr_left", "_lr_rr")
  }

  /** Equidistant systematic selection: per group, keep exactly
    * min(seats, population) rows, evenly spread through the group's
    * `orderCol` order — rank r is kept iff `(r·seats) div c` strictly
    * exceeds `((r−1)·seats) div c` (the stride crosses an integer
    * boundary at r). Pure BIGINT comparisons; with a salted-hash order
    * key this is a deterministic stratified uniform draw.
    *
    * Scale shape: the per-group rank is
    * [[PrefixSumOps.exclusiveRunningSumAuto]] (two-phase — no
    * one-reducer-per-group window); `seats` (one row per group:
    * partCols + `cCol` + `seatCol`) joins back UNHINTED so AQE
    * broadcasts it when it fits. Inherits the prefix-sum contract:
    * `orderCol` numeric, non-negative, unique within its group; and
    * `population · seats` must fit in a long.
    *
    * @return selected rows + `rankOut` (the 1-based within-group rank)
    */
  def stratifiedSystematic(df: DataFrame, partCols: Seq[String],
      orderCol: String, seats: DataFrame, cCol: String, seatCol: String,
      rankOut: String): DataFrame = {
    val ranked = PrefixSumOps.exclusiveRunningSumAuto(
        df.withColumn("_ss_one", lit(1L)), partCols, orderCol, "_ss_one", "_ss_excl")
      .withColumn(rankOut, (col("_ss_excl") + 1L).cast("long"))
    ranked.join(seats, partCols)
      .where(col(seatCol) > 0 &&
        expr(s"(`$rankOut` * `$seatCol`) div `$cCol`") >
          expr(s"((`$rankOut` - 1) * `$seatCol`) div `$cCol`"))
      .drop("_ss_one", "_ss_excl")
  }
}
