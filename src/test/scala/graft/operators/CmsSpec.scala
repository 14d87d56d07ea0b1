package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Count-min sketch contracts (q107): the one-sided error guarantee
  * (est ≥ exact, always — the property a monitoring consumer relies
  * on), bounded state, and exactness in the collision-free regime.
  */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed deterministic stream: key k appears ~(64 - k) times
  private def stream(nKeys: Int) =
    (0 until nKeys).flatMap(k => Seq.fill(64 - (k % 60))(k.toLong))
      .toDF("pk")

  test("cmsEstimate never under-counts (one-sided error, every key)") {
    val keys = stream(200)
    val counters = SketchOps.cmsCounters(keys, "pk", depth = 4, width = 32)
    val exact = keys.groupBy("pk").agg(count(lit(1)).as("exact"))
    val under = SketchOps.cmsEstimate(counters, exact, "pk",
        depth = 4, width = 32)
      .where(col("est") < col("exact")).count()
    assert(under == 0, "CMS under-counted — the min over rows is broken")
  }

  test("cmsEstimate tolerates queryKeys already carrying d/b/c columns (ADVICE r16 #2)") {
    val keys = stream(8) // collision-free regime: est must equal exact
    val counters = SketchOps.cmsCounters(keys, "pk", depth = 4, width = 256)
    // a caller frame whose columns collide with the old working names
    val exact = keys.groupBy("pk").agg(count(lit(1)).as("exact"))
      .withColumn("d", lit(-1)).withColumn("b", lit(-2L))
      .withColumn("c", lit(-3L))
    val est = SketchOps.cmsEstimate(counters, exact, "pk",
      depth = 4, width = 256)
    assert(est.columns.sorted.toSeq == Seq("b", "c", "d", "est", "exact", "pk"))
    assert(est.where(col("est") =!= col("exact")).count() == 0)
    // caller columns pass through untouched
    assert(est.where(col("d") =!= -1 || col("b") =!= -2L || col("c") =!= -3L)
      .count() == 0)
    // a pre-existing `est` column is rejected loudly, never duplicated
    intercept[IllegalArgumentException] {
      SketchOps.cmsEstimate(counters,
        exact.withColumnRenamed("exact", "est"), "pk", 4, 256)
    }
  }

  test("cms state is bounded by depth × width, independent of key cardinality") {
    val counters = SketchOps.cmsCounters(stream(5000), "pk",
      depth = 4, width = 64)
    assert(counters.count() <= 4L * 64)
  }

  test("cmsInnerProduct never under-estimates the equi-join size") {
    val a = stream(300)
    val b = stream(120)
    val truth = a.groupBy("pk").agg(count(lit(1)).as("ca"))
      .join(b.groupBy("pk").agg(count(lit(1)).as("cb")), "pk")
      .agg(sum(col("ca") * col("cb"))).head().getLong(0)
    for (w <- Seq(16, 64, 1024)) {
      val est = SketchOps.cmsInnerProduct(
        SketchOps.cmsCounters(a, "pk", depth = 4, width = w),
        SketchOps.cmsCounters(b, "pk", depth = 4, width = w))
        .head().getLong(0)
      assert(est >= truth, s"width $w under-estimated: $est < $truth")
    }
  }

  test("cmsInnerProduct of disjoint streams with no shared buckets is 0, not empty") {
    val a = Seq(1L).toDF("pk")
    val b = Seq(2L).toDF("pk")
    // width 2: buckets may or may not collide — both outcomes must yield
    // a single row (0 on no shared bucket, >= 0 otherwise)
    val est = SketchOps.cmsInnerProduct(
      SketchOps.cmsCounters(a, "pk", depth = 4, width = 1048576),
      SketchOps.cmsCounters(b, "pk", depth = 4, width = 1048576))
      .collect()
    assert(est.length == 1 && est(0).getLong(0) >= 0)
  }

  test("collision-free regime is exact; totals are preserved per row") {
    val keys = stream(8) // 8 keys into 256 buckets: collisions ~0
    val counters = SketchOps.cmsCounters(keys, "pk", depth = 4, width = 256)
    val exact = keys.groupBy("pk").agg(count(lit(1)).as("exact"))
    val est = SketchOps.cmsEstimate(counters, exact, "pk",
      depth = 4, width = 256)
    assert(est.where(col("est") =!= col("exact")).count() == 0)
    // each depth row's counters sum to the stream length (mass conservation)
    val n = keys.count()
    val rows = counters.groupBy("d").agg(sum("c").as("s"))
      .where(col("s") =!= n).count()
    assert(rows == 0)
  }
}
