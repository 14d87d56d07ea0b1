package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q71's composition claim, asserted on the actual plan: the z-ordered
  * scan pushes BOTH clustering-column predicates down to parquet, and the
  * bin-free BETWEEN join is rewritten by BinnedRangeJoinRule into a binned
  * equi-join (no broadcast nested loop survives). Value-preservation is
  * checked against the un-rewritten naive join; end-to-end values are the
  * DuckDB oracle's job (q71 in CORRECTNESS).
  */
class ZOrderRangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("composed plan shows pushed z-column filters AND the binned equi-join") {
    val rule = graft.plans.BinnedRangeJoinRule
    if (!spark.experimental.extraOptimizations.exists(_ eq rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    spark.conf.set(rule.WidthConf, "30")
    try {
      val qe = ZOrderRangeJoin.naiveJoin(spark, sfDir).queryExecution
      val optimized = qe.optimizedPlan.toString
      assert(optimized.contains("_graft_bin"),
        s"rule did not insert the bin equi-key:\n$optimized")
      val physical = qe.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"),
        s"range join still runs as a nested loop:\n$physical")
      // the plan STRING truncates long filter lists; read the scan node's
      // untruncated metadata instead
      val zScan = qe.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("graft_zorder")) => s
      }
      assert(zScan.nonEmpty, s"no scan of the z-ordered copy found:\n$physical")
      val pushedFilters = zScan.head.metadata("PushedFilters")
      for (pushed <- Seq("GreaterThanOrEqual(l_partkey,50)",
          "LessThanOrEqual(l_partkey,500)",
          "GreaterThanOrEqual(l_suppkey,2)", "LessThanOrEqual(l_suppkey,40)"))
        assert(pushedFilters.contains(pushed),
          s"predicate not pushed to the z-ordered scan: $pushed in $pushedFilters")
    } finally spark.conf.unset(rule.WidthConf)
  }

  test("the rewrite is value-preserving vs the un-rewritten naive join") {
    // rule off: plain BETWEEN join (BNLJ at this scale — fine in a spec)
    spark.conf.unset(graft.plans.BinnedRangeJoinRule.WidthConf)
    val naive = ZOrderRangeJoin.naiveJoin(spark, sfDir).collect().toSeq
    val rewritten = ZOrderRangeJoin.run(spark, sfDir).collect().toSeq
    assert(naive.nonEmpty, "empty result would make this test vacuous")
    assert(rewritten == naive)
  }
}
