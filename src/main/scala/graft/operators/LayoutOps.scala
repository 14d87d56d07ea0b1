package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * A parquet lake prunes row groups by per-file min/max statistics. A
  * sort on one column gives perfect pruning on that column and none on
  * any other; interleaving the bits of several columns (a Z-order /
  * Morton curve) keeps every interleaved column's per-file range narrow,
  * so predicates on ANY of them skip most files — the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. At 100 TB this is the difference
  * between scanning the lake and scanning a few percent of it for
  * selective multi-column predicates.
  *
  * All-integer bit arithmetic (shift/mask/or), so the value is exact and
  * reproducible in any engine — the DuckDB oracle mirrors it digit for
  * digit (q69).
  */
object LayoutOps {

  /** Morton (Z-curve) value of two non-negative int columns, `bits` low
    * bits each (clamped via mask): x's bit i lands at 2i, y's at 2i+1.
    */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)

  /** Write `df` z-clustered on (xCol, yCol): range-partition + sort by
    * the z-value so consecutive files cover compact rectangles of the
    * (x, y) space. `repartitionByRange` samples the z distribution, so
    * file count stays balanced under any skew.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) width of `valueCol` across the files of a
    * parquet dir — the quantity row-group pruning depends on. Returns
    * one row per file; the SUM of widths is the pruning figure of merit
    * (smaller = a point predicate touches fewer files).
    */
  def perFileRange(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg((max(col(valueCol)) - min(col(valueCol))).as("range_width"),
        count(lit(1)).as("n_rows"))
}
