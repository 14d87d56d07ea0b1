package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Window => LWindow}
import graft.TestSpark

/** Direct spec for [[TopKOps.perGroupTopK]] (VERDICT r5/r6 next-round #3):
  * the salted two-phase top-k must equal the bare single-window top-k for
  * ANY salt bucket count — that is the correctness argument (the true
  * top-k is contained in the union of per-salt top-k's under any disjoint
  * split) made executable. Plus the plan-shape invariant the operator
  * exists for: no low-cardinality row_number/prefix-sum window over
  * unreduced input in the queries that use it (tx07, dp06, dp03).
  */
class TopKOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 3 low-card groups x 500 rows; value from a multiplicative hash mod a
  // small prime so every group has many ties — the case where a non-total
  // order would diverge. (g, v, id): id unique => (v desc, id) is total.
  private lazy val df = {
    import spark.implicits._
    (0 until 1500).map { i =>
      (s"g${i % 3}", math.abs((i * 2654435761L) % 97), i.toLong)
    }.toDF("g", "v", "id")
  }

  private def bareTopK(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  test("perGroupTopK == bare window top-k for saltBuckets in {1, 2, 16, 64}") {
    val k = 7
    val expected = bareTopK(k).select("g", "id", "rank").collect().toSet
    for (b <- Seq(1, 2, 16, 64)) {
      val got = TopKOps.perGroupTopK(df, Seq("g"),
          Seq(col("v").desc, col("id").asc), k, saltOn = col("id"),
          saltBuckets = b)
        .select("g", "id", "rank").collect().toSet
      assert(got == expected, s"diverged from bare window at saltBuckets=$b")
    }
  }

  test("k >= group size returns every row, still correctly ranked") {
    val got = TopKOps.perGroupTopK(df, Seq("g"),
        Seq(col("v").desc, col("id").asc), k = 1000, saltOn = col("id"),
        saltBuckets = 16)
      .select("g", "id", "rank").collect().toSet
    val expected = bareTopK(1000).select("g", "id", "rank").collect().toSet
    assert(got == expected && got.size == 1500)
  }

  /** The scale invariant behind TopKOps and PrefixSumOps: a window
    * partitioned by a SINGLE low-cardinality key (`lang`, ~5 values) runs
    * one task per value, so it may only ever see REDUCED input — either an
    * aggregate's output or rows already pruned by a salted phase-1 rank
    * filter. Audited on the optimized logical plan of every catalog query
    * that ranks or prefix-sums per language.
    */
  test("no lang-partitioned window runs over unreduced input (tx07/dp06/dp03)") {
    val cat = graft.queries.Catalog.all.map(q => q.name -> q).toMap
    val sfDir = "/root/testdata/sf0.001"
    for (name <- Seq("tx07_bigrams", "dp06_domain_cap", "dp03_seq_packing",
        "dp03b_shard_packing")) {
      val plan = cat(name).fn(spark, sfDir).queryExecution.optimizedPlan
      val langOnly = plan.collect {
        case w: LWindow if w.partitionSpec.length == 1 &&
            w.partitionSpec.head.isInstanceOf[AttributeReference] &&
            w.partitionSpec.head.asInstanceOf[AttributeReference].name == "lang" => w
      }
      langOnly.foreach { w =>
        val reduced = w.child.collectFirst {
          case a: Aggregate => a
          case f: Filter if f.condition.references.exists(_.name.startsWith("_rn")) => f
        }.isDefined
        assert(reduced,
          s"$name: window partitioned solely by `lang` over unreduced input:\n$w")
      }
    }
  }
}
