package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[SimilarityOps.kmeansFit]] — behavioral contract beyond the ann08
  * oracle (which pins cross-engine exactness): on separable data the
  * trained centroids recover the true cluster structure, the result is
  * identical under any input partitioning, and a starved cell survives
  * via the empty-cluster fallback instead of crashing later rounds.
  */
class KmeansFitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 well-separated clusters around orthogonal 4-d corners, 40 points
  // each. Ids INTERLEAVE across clusters (cluster c gets c, c+3, c+6, …),
  // so the 3 smallest ids — kmeansFit's deterministic seeds — are one
  // point in each cluster and Lloyd's converges to the true partition.
  private lazy val clustered = {
    val centers = Seq(
      Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f), Seq(0f, 0f, 10f, 0f))
    for { c <- 0 until 3; j <- 0 until 40 } yield (
      (c + 3 * j).toLong,
      centers(c).zipWithIndex.map { case (x, d) =>
        x + (if (d == (j % 4)) ((c * 40 + j) * 2654435761L % 7).toFloat / 10f
             else 0f)
      })
  }

  test("recovers separable clusters: every cell holds exactly its true members") {
    val df = clustered.toDF("id", "vec")
    // samplePerCell = 0: this test pins the Lloyd's kernel itself (seed
    // coverage of all 3 clusters needs the full 120-row corpus)
    val out = SimilarityOps.kmeansFit(df, "id", "vec", k = 3, iters = 3,
      samplePerCell = 0)
    val cells = out.groupBy("cell").agg(max("n_vectors").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(cells.keySet == Set(0L, 1L, 2L), s"cells: $cells")
    assert(cells.values.forall(_ == 40), s"uneven cells: $cells")
    // each centroid's dominant dimension sits near its true center (10);
    // off-dimensions stay near 0 (only bounded jitter was added)
    val byCell = out.as[(Long, Int, Long, Double)].collect().groupBy(_._1)
    for ((cell, rows) <- byCell) {
      val dom = rows.maxBy(_._4)
      assert(dom._2 == cell.toInt && dom._4 > 9.0 && dom._4 < 11.0,
        s"cell $cell centroid off: dominant $dom")
      assert(rows.filter(_._2 != cell.toInt).forall(r => math.abs(r._4) < 1.0),
        s"cell $cell off-dims not near zero")
    }
  }

  test("deterministic under input partitioning") {
    // default samplePerCell (sampling active: cap 48 < 120 rows) — the
    // salted-md5 draw must itself be partition-independent
    val df = clustered.toDF("id", "vec")
    val a = SimilarityOps.kmeansFit(df, "id", "vec", k = 3, iters = 2)
      .collect().map(_.toString).sorted.toSeq
    val b = SimilarityOps.kmeansFit(df.repartition(7, col("vec")), "id", "vec",
        k = 3, iters = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("training runs on exactly the bounded salted-md5 sample") {
    val df = clustered.toDF("id", "vec")
    // sampled fit == unsampled fit over the explicitly-drawn subset (the
    // oracle-mirror property: the smp CTE and this orderBy are the same
    // deterministic draw)
    val sampled = SimilarityOps.kmeansFit(df, "id", "vec", k = 3, iters = 2,
        samplePerCell = 16)
      .collect().map(_.toString).sorted.toSeq
    val drawn = df.orderBy(
      md5(concat(lit("km:"), col("id").cast("string"))), col("id")).limit(48)
    val explicit = SimilarityOps.kmeansFit(drawn, "id", "vec", k = 3, iters = 2,
        samplePerCell = 0)
      .collect().map(_.toString).sorted.toSeq
    assert(sampled == explicit)
    // the bound itself: training membership sums to the cap, not the corpus
    val trained = SimilarityOps.kmeansFit(df, "id", "vec", k = 3, iters = 1,
        samplePerCell = 16)
      .where(col("dim") === 0).agg(sum("n_vectors")).as[Long].head()
    assert(trained == 48L, s"training set size $trained (cap 16×3 of 120 rows)")
  }

  test("a starved cell survives rounds via the empty-cluster fallback") {
    // every vector is IDENTICAL: each round all points tie between the
    // two (equal) centroids and the cent_id tie-break sends everything to
    // cell 0 — cell 1 is starved in EVERY round. The fallback must keep
    // centroid 1 alive in the centroid table so each round still ranks
    // against k=2 centroids without error; the M-step output then
    // contains only the non-empty cell.
    val rows = (0 to 21).map(i => (i.toLong, Seq(1f, 1f, 0f, 0f)))
    val df = rows.toDF("id", "vec")
    val out = SimilarityOps.kmeansFit(df, "id", "vec", k = 2, iters = 3,
      samplePerCell = 0)
    val n = out.groupBy("cell").agg(max("n_vectors")).as[(Long, Long)]
      .collect().toMap
    assert(n == Map(0L -> 22L), s"membership: $n")
  }
}
