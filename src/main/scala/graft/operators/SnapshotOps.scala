package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change capture (SCD-style diff).
  *
  * The reference's incremental load dedups only in one direction: new
  * rows not present in the snapshot are appended (J1/J2 anti-join,
  * `procedure_code.py:795-807`). A production warehouse needs the full
  * diff — added, removed, changed, unchanged — to drive merges and
  * late-arriving corrections. One full-outer hash join on the business
  * key gives all four classes in a single shuffle; change detection is
  * null-safe column equality (`<=>`), so NULL→value and value→NULL both
  * read as changes.
  *
  * Scale: the join shuffles both snapshots by key once (broadcast when
  * either side is small, AQE splits skewed keys); no window, no
  * driver-side state.
  */
object SnapshotOps {

  /** Diff `newDf` against `oldDf` by `keys`, comparing `compareCols`.
    * Returns one row per key present in either snapshot with columns:
    * keys, `_old_<c>`/`_new_<c>` for each compared column, and `status`
    * in {added, removed, changed, unchanged}.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = compareCols.foldLeft(
      oldDf.select((keys ++ compareCols).map(col): _*)
        .withColumn("_in_old", lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"_old_$c")
    }
    val n = compareCols.foldLeft(
      newDf.select((keys ++ compareCols).map(col): _*)
        .withColumn("_in_new", lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"_new_$c")
    }
    val changed = compareCols
      .map(c => !(col(s"_old_$c") <=> col(s"_new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .drop("_in_old", "_in_new")
  }
}
