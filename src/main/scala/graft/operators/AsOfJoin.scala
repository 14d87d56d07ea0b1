package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTs <= leftTs` sharing the join key. Spark has no built-in as-of
  * join; the naive encodings are a non-equi join (BroadcastNestedLoop —
  * quadratic) or a per-left-row range scan. This uses the union+window
  * encoding instead (SURVEY §2.4 preference order (a): compose
  * built-ins):
  *
  *   union both sides tagged -> one shuffle+sort by (key, ts, tag) ->
  *   `last(right payload, ignoreNulls)` running window -> keep left rows.
  *
  * Cost at scale: exactly ONE exchange on the key and one sort — the same
  * plan shape as any windowed aggregation, linear in |L|+|R| (vs the
  * quadratic nested-loop a theta-join would plan). Ties (right.ts ==
  * left.ts) match, mirroring standard ASOF semantics.
  *
  * Right rows must be unique per (key, ts) for deterministic output —
  * pre-aggregate duplicates away (the query layer does).
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      lookup rows; columns other than key/ts are carried
    * @param key        equi-join key column name (both sides)
    * @param tsCol      event-time column name (both sides)
    * @param rightValue single right payload column to attach
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightValue: String): DataFrame = {
    val l = left.withColumn("_tag", lit(1)).withColumn(rightValue, lit(null).cast(
      right.schema(rightValue).dataType))
    val r = right.select(col(key), col(tsCol), col(rightValue))
      .withColumn("_tag", lit(0))
    val leftCols = left.columns
    val unioned = l.select((leftCols :+ rightValue :+ "_tag").map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (ties match)
    val w = Window.partitionBy(key).orderBy(col(tsCol).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col(rightValue), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .drop("_tag", rightValue)
      .withColumnRenamed("_asof", rightValue)
  }
}
