package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BinnedRangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rangeJoin() = {
    val points = (0L to 300L).toDF("p")
    val intervals = Seq((10L, 30L), (25L, 60L), (200L, 207L), (290L, 310L))
      .toDF("s", "e")
    points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
  }

  private def withRule[T](width: Long)(body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
    spark.conf.set(BinnedRangeJoinRule.WidthConf, width.toString)
    try body
    finally {
      spark.conf.unset(BinnedRangeJoinRule.WidthConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq BinnedRangeJoinRule)
    }
  }

  test("rewrites the nested-loop range join to a binned equi-join, same rows") {
    val expected = rangeJoin().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(expected.nonEmpty)
    // sanity: without the rule this plans as a nested-loop join
    assert(rangeJoin().queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))

    withRule(width = 16) {
      val rewritten = rangeJoin()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("_graft_bin"), plan)
      val got = rewritten.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(got == expected)
    }
  }

  test("any bin width preserves semantics (pair meets only in the point's bin)") {
    val expected = rangeJoin().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    for (w <- Seq(1L, 3L, 64L, 1000L)) {
      withRule(w) {
        val got = rangeJoin().collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
        assert(got == expected, s"width $w")
      }
    }
  }

  test("mirrored orientation (intervals on the left) also rewrites correctly") {
    val intervals = Seq((10L, 30L), (200L, 207L)).toDF("s", "e")
    val points = (0L to 300L).toDF("p")
    def join() = intervals.join(points, col("p") >= col("s") && col("p") <= col("e"))
    val expected = join().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    withRule(width = 16) {
      val rewritten = join()
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      val got = rewritten.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(got == expected && got.nonEmpty)
    }
  }

  test("joins with an equi-key or extra predicates are left untouched") {
    withRule(width = 16) {
      val a = Seq((1L, 5L), (2L, 9L)).toDF("k", "v")
      val b = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("k", "lo", "hi")
      val equi = a.join(b, a("k") === b("k") && a("v") >= b("lo") && a("v") <= b("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      assert(equi.collect().map(_.getLong(0)).toSeq == Seq(1L))
    }
  }
}
