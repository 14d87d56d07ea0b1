package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[SimilarityOps.pqFit]] — behavioral contract beyond the ann09
  * oracle: each BLOCK's codebook recovers that block's own cluster
  * structure (the per-subspace independence that defines PQ), the
  * result is partitioning-independent, and codebooks differ across
  * blocks when the sub-distributions differ.
  */
class PqFitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2 blocks x 2 sub-clusters, constructed so the clusters PAIR UP
  // DIFFERENTLY per block: vectors come in 4 kinds over ids 0..79 —
  // block 0 sub-vector is A or B by (id % 2), block 1 sub-vector is C
  // or D by (id div 2 % 2). The 2 smallest ids (0, 1 — the seeds) cover
  // {A, B} in block 0 but {C, C} in block 1: block 1's round 1 ties
  // every row to the lower code (identical seeds), code 1 survives on
  // the empty-code fallback, and round 2 splits C/D cleanly off the
  // collapsed (0,0) mean — so this corpus exercises the fallback AND
  // convergence-after-degeneracy in one run, deterministically.
  private def mk(id: Long): (Long, Seq[Float]) = {
    val b0 = if (id % 2 == 0) Seq(10f, 0f) else Seq(0f, 10f)
    val b1 = if ((id / 2) % 2 == 0) Seq(5f, 5f) else Seq(-5f, -5f)
    (id, b0 ++ b1)
  }
  private lazy val vecs = (0L until 80L).map(mk)

  test("per-block codebooks recover each block's own clusters") {
    val df = vecs.toDF("id", "vec")
    // samplePerCode 40 -> sample cap 80 = the whole corpus (kernel test)
    val out = SimilarityOps.pqFit(df, "id", "vec", blocks = 2, subDim = 2,
      codesPerBlock = 2, iters = 3, samplePerCode = 40)
    val cb = out.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    // block 0: the two codes split on (id % 2) -> 40/40 members, means
    // at the exact corners (10,0) and (0,10)
    val b0counts = cb.collect { case ((0, _, 0), (n, _)) => n }.toSeq
    assert(b0counts.sorted == Seq(40L, 40L), s"block-0 split: $cb")
    val b0means = cb.collect { case ((0, c, d), (_, m)) => (c, d) -> m }.toMap
    val seedEven = 0L // id 0 is even -> code 0 holds the (10,0) cluster
    assert(math.abs(b0means((seedEven, 0)) - 10.0) < 1e-6
      && math.abs(b0means((seedEven, 1)) - 0.0) < 1e-6, s"$b0means")
    // block 1: codes split on (id div 2 % 2) -> 40/40, means (5,5)/(-5,-5)
    val b1counts = cb.collect { case ((1, _, 0), (n, _)) => n }.toSeq
    assert(b1counts.sorted == Seq(40L, 40L), s"block-1 split: $cb")
    val b1means = cb.collect { case ((1, c, d), (_, m)) => (c, d) -> m }.toMap
    assert(b1means.values.toSeq.map(v => math.abs(math.abs(v) - 5.0)).forall(_ < 1e-6),
      s"block-1 means must sit at +-5 corners: $b1means")
  }

  test("result is identical under repartitioning") {
    val df = vecs.toDF("id", "vec")
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilarityOps.pqFit(d, "id", "vec", blocks = 2, subDim = 2,
        codesPerBlock = 2, iters = 2, samplePerCode = 8)
        .collect().map(_.toSeq).toSet
    assert(run(df.repartition(13)) == run(df.repartition(1)))
  }
}
