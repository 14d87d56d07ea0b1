package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LayoutOps

/** The two layout/join scale techniques COMPOSED (VERDICT r5/r6 next-round
  * #5): a point-in-interval range join executed over a Z-ordered table.
  *
  *  - the fact table is written z-clustered on (l_partkey, l_suppkey)
  *    ([[LayoutOps.writeZOrdered]]), so the query's selective predicates
  *    on BOTH columns prune at the parquet row-group level — at 100 TB
  *    the scan touches a few percent of the files instead of the lake;
  *  - the surviving rows range-join against order intervals with NO
  *    manual binning in the query text: [[graft.plans.BinnedRangeJoinRule]]
  *    supplies the `floor(p/w)` equi-key at plan time, so the join hashes
  *    by bin instead of running a broadcast nested loop.
  *
  * ZOrderRangeJoinSpec asserts the composed plan carries both artifacts:
  * pushed filters on the two z-columns at the scan, and the rule's
  * `_graft_bin` equi-key at the join.
  */
object ZOrderRangeJoin {

  /** Build (once per sf dir) a z-ordered projection of `lineitem`,
    * clustered on (l_partkey, l_suppkey). Cached under /tmp keyed by the
    * source dir; `_GRAFT_ZDONE` marks a completed build so verify/bench
    * reruns skip the write.
    */
  def ensureZOrderedLineitem(spark: SparkSession, sfDir: String): String = {
    import java.nio.file.{Files, Paths}
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val dst = s"/tmp/graft_zorder/$key"
    val done = Paths.get(dst, "_GRAFT_ZDONE")
    // cache key includes the source's size+mtime: a regenerated corpus at
    // the same path invalidates the copy instead of serving stale rows
    val src = Paths.get(sfDir, "lineitem.parquet")
    val stamp = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
    val fresh = Files.exists(done) && Files.readString(done) == stamp
    if (!fresh) {
      val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity")
      LayoutOps.writeZOrdered(li, s"$dst/lineitem", "l_partkey", "l_suppkey",
        numFiles = 8)
      Files.createDirectories(Paths.get(dst))
      Files.writeString(done, stamp)
    }
    s"$dst/lineitem"
  }

  /** The naive query shape — selective two-column predicate over the
    * z-ordered table, then a plain BETWEEN join against the order
    * intervals. Deliberately bin-free: the optimizer rule adds the bins.
    */
  def naiveJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val points = spark.read.parquet(ensureZOrderedLineitem(spark, sfDir))
      .where(col("l_partkey").between(50, 500) && col("l_suppkey").between(2, 40))
      .select(col("l_quantity"),
        datediff(col("l_shipdate"), epoch).as("_p"))
    val intervals = graft.sources.Tables.table(spark, sfDir, "orders")
      .where(col("o_orderkey") % 200 === 0)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), epoch).as("_start"),
        (datediff(col("o_orderdate"), epoch) + 30).as("_end"))
    points.join(intervals,
        col("_p") >= col("_start") && col("_p") <= col("_end"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity").cast("decimal(12,2)")), 2).cast("double").as("qty"))
      .orderBy("o_orderkey")
  }

  /** Run `naiveJoin` with the binned-range-join rule active for the scope
    * of one eager materialization (the same discipline as q67).
    */
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val rule = graft.plans.BinnedRangeJoinRule
    if (!spark.experimental.extraOptimizations.exists(_ eq rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    spark.conf.set(rule.WidthConf, "30")
    try naiveJoin(spark, sfDir).localCheckpoint()
    finally spark.conf.unset(rule.WidthConf)
  }
}
