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
    *
    * Concurrency: the original check-then-build raced — two sessions
    * (test suite + bench) could both see a missing/stale stamp, and one
    * would read a half-written copy while the other overwrote it
    * (ADVICE r7). Builders now serialize on an inter-process file lock
    * (plus this object's monitor for same-JVM threads), build into a
    * UNIQUE temp dir, and atomically rename into place — the stamp file
    * travels inside the renamed dir, so it exists iff the copy is whole.
    */
  def ensureZOrderedLineitem(spark: SparkSession, sfDir: String): String = synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.StandardOpenOption.{CREATE, WRITE}
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = Paths.get("/tmp/graft_zorder")
    Files.createDirectories(root)
    val dst = root.resolve(key)
    // cache key includes the source's size+mtime: a regenerated corpus at
    // the same path invalidates the copy instead of serving stale rows
    val src = Paths.get(sfDir, "lineitem.parquet")
    val stamp = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
    def fresh: Boolean = {
      val done = dst.resolve("_GRAFT_ZDONE")
      Files.exists(done) && Files.readString(done) == stamp
    }
    if (!fresh) {
      val ch = java.nio.channels.FileChannel.open(root.resolve(s"$key.lock"), CREATE, WRITE)
      try {
        val lock = ch.lock()
        try if (!fresh) { // re-check: the previous lock holder may have built it
          val tmp = root.resolve(s"$key.tmp-${java.util.UUID.randomUUID()}")
          val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
            .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity")
          LayoutOps.writeZOrdered(li, tmp.resolve("lineitem").toString,
            "l_partkey", "l_suppkey", numFiles = 8)
          Files.writeString(tmp.resolve("_GRAFT_ZDONE"), stamp)
          // replace any stale copy, then move the whole build into place
          if (Files.exists(dst)) {
            val trash = root.resolve(s"$key.old-${java.util.UUID.randomUUID()}")
            Files.move(dst, trash, StandardCopyOption.ATOMIC_MOVE)
            org.apache.commons.io.FileUtils.deleteQuietly(trash.toFile)
          }
          Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
        } finally lock.release()
      } finally ch.close()
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
