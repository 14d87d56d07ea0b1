package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilarityOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: parallel -> 1, orthogonal -> 0, zero vector -> 0") {
    val df = Seq((Seq(1f, 2f, 0f), Seq(2f, 4f, 0f), Seq(0f, 0f, 1f), Seq(0f, 0f, 0f)))
      .toDF("a", "b", "c", "z")
    val (par, ort, zer) = df.select(
      SimilarityOps.cosine(col("a"), col("b")),
      SimilarityOps.cosine(col("a"), col("c")),
      SimilarityOps.cosine(col("a"), col("z"))).as[(Double, Double, Double)].head()
    assert(math.abs(par - 1.0) < 1e-12 && ort == 0.0 && zer == 0.0)
  }

  test("bruteForceTopK ranks an exact duplicate vector first") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f)),   // duplicate of 0
      (2L, Seq(0.9f, 0.1f, 0f)),
      (3L, Seq(0f, 1f, 0f)))
      .toDF("id", "vec")
    val top = SimilarityOps.bruteForceTopK(vecs.where(col("id") === 0), vecs, k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(top.head == 1L)   // the duplicate
    assert(top(1) == 2L)     // the near-neighbor
  }

  test("lshTopK only pairs vectors in the same sign bucket") {
    val vecs = Seq(
      (0L, Seq(1f, 1f, 1f, 1f)),
      (1L, Seq(1f, 1f, 1f, 0.5f)),  // same bucket as 0
      (2L, Seq(-1f, -1f, -1f, -1f))) // different bucket
      .toDF("id", "vec")
    val out = SimilarityOps.lshTopK(vecs.where(col("id") === 0), vecs, k = 5,
      axes = 0 until 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("embeddingNearDupPairs finds duplicates above threshold") {
    val vecs = Seq(
      (0L, Seq(1f, 2f, 3f, 4f)),
      (1L, Seq(1f, 2f, 3f, 4f)),
      (2L, Seq(-4f, 3f, -2f, 1f)))
      .toDF("id", "vec")
    val pairs = SimilarityOps.embeddingNearDupPairs(vecs, threshold = 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("quantizedCentroids: fixed-point mean equals the exact mean") {
    // values chosen representable at 2^20 fixed point -> mean is exact
    val vecs = Seq(
      ("a", Seq(1.0f, -0.5f)),
      ("a", Seq(0.5f, 0.25f)),
      ("b", Seq(2.0f, 4.0f)))
      .toDF("cell", "vec")
    val got = SimilarityOps.quantizedCentroids(vecs, "cell", "vec")
      .select("cell", "dim", "n_vectors", "mean")
      .as[(String, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == Map(
      ("a", 0) -> ((2L, 0.75)), ("a", 1) -> ((2L, -0.125)),
      ("b", 0) -> ((1L, 2.0)), ("b", 1) -> ((1L, 4.0))))
  }

  test("knnGraph equals the window-based ivfTopK pointed at every vector") {
    import spark.implicits._
    // 60 deterministic 8-dim vectors, 4 trained-shaped centroids: the
    // aggregator-reduced probe ranking and k-bounded top-k must produce
    // EXACTLY the window formulation's rows (same rounded sims, same
    // (sim desc, id) ties) — that is knnGraph's correctness claim.
    def vec(i: Int): Seq[Double] =
      (0 until 8).map(d => math.sin(i * 131 + d * 17).abs + 0.1 * d)
    val corpus = (0 until 60).map(i => (i.toLong, vec(i))).toDF("id", "vec")
    val cents = Seq(0, 1, 2, 3)
      .map(c => (c.toLong, (0 until 8).map(d => math.cos(c * 37 + d * 29) + 1.1)))
      .toDF("cell", "cvec")
    val viaGraph = SimilarityOps.knnGraph(corpus, "id", "vec", cents,
        k = 5, nProbe = 2)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val viaWindow = SimilarityOps.ivfTopK(corpus, lit(true), cents,
        k = 5, nProbe = 2)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank").cast("int"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(viaGraph == viaWindow)
    assert(viaGraph.nonEmpty)
    // structural invariants: no self edges, <= k per query, ranks dense
    viaGraph.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.forall(_._2 != q))
      assert(rows.size <= 5)
      assert(rows.map(_._4).toSeq.sorted == (1 to rows.size))
    }
  }

  test("ivfFilteredTopK: neighbors carry the query's label only; same-label twin wins") {
    import spark.implicits._
    // two interleaved label populations; vector 3's exact twin exists in
    // BOTH labels — the filtered search must return the SAME-label twin
    // and never a cross-label row, even though the cross-label twin has
    // identical cosine (the post-filter failure mode made visible)
    def vec(i: Int): Seq[Double] =
      (0 until 8).map(d => math.sin(i * 53 + d * 11).abs + 0.05)
    val base = (0 until 40).map(i => (i.toLong, vec(i), i % 2))
    val twins = Seq((500L, vec(3), 1), (501L, vec(3), 0)) // query 3 has label 1
    val corpus = (base ++ twins).toDF("id", "vec", "label")
    val cents = Seq((0L, (0 until 8).map(_ => 1.0)), (1L, (0 until 8).map(d => d * 0.25)))
      .toDF("cell", "cvec")
    val got = SimilarityOps.ivfFilteredTopK(corpus, col("id") < 10, cents,
        attrCol = "label", k = 3, nProbe = 2)
      .select("query_id", "rank", "neighbor_id", "label", "sim")
      .as[(Long, Int, Long, Int, Double)].collect()
    assert(got.nonEmpty)
    val labelOf = (base ++ twins).map(t => t._1 -> t._3).toMap
    got.foreach { case (q, _, n, l, _) =>
      assert(l == labelOf(q), s"query $q got cross-label neighbor $n")
      assert(labelOf(n) == labelOf(q))
    }
    val q3 = got.filter(_._1 == 3L).sortBy(_._2)
    assert(q3.head._3 == 500L && q3.head._5 == 1.0,
      s"same-label twin must rank first for query 3: ${q3.toSeq}")
  }

  test("knnGraph ranks a planted twin first with sim 1") {
    import spark.implicits._
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 7 + d).abs + 0.01)))
    val twin = Seq((1000L, base(5)._2)) // exact copy of vector 5
    val corpus = (base ++ twin).toDF("id", "vec")
    val cents = Seq((0L, (0 until 8).map(_ => 1.0)), (1L, (0 until 8).map(d => d * 0.3)))
      .toDF("cell", "cvec")
    val got = SimilarityOps.knnGraph(corpus, "id", "vec", cents, k = 3)
      .where(col("query_id") === 5L && col("rank") === 1)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((1000L, 1.0)))
  }

  test("ivfRangeSearch: no false positives, contained in the exact tau-set") {
    import spark.implicits._
    // the zero-false-positive contract: candidates are exact-rescored
    // before the threshold, so every returned pair really has rounded
    // sim >= tau AND appears in the brute-force tau-set — the only
    // legal misses are unprobed cells (IVF's usual recall trade)
    def vec(i: Int): Seq[Double] =
      (0 until 8).map(d => math.sin(i * 131 + d * 17).abs + 0.1 * d)
    val corpus = (0 until 60).map(i => (i.toLong, vec(i))).toDF("id", "vec")
    val cents = Seq(0, 1, 2, 3)
      .map(c => (c.toLong, (0 until 8).map(d => math.cos(c * 37 + d * 29) + 1.1)))
      .toDF("cell", "cvec")
    val tau = 0.9
    val got = SimilarityOps.ivfRangeSearch(corpus, col("id") < 10, cents,
        tau = tau, nProbe = 2)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._3 >= tau))
    assert(got.forall(r => r._1 != r._2))
    // brute-force exact tau-set over raw doubles (same rounding)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.round(r * 1e6) / 1e6
    }
    val exact = (for {
      q <- 0 until 10; n <- 0 until 60 if n != q
      if cos(vec(q), vec(n)) >= tau
    } yield (q.toLong, n.toLong)).toSet
    assert(got.map(r => (r._1, r._2)).toSet.subsetOf(exact),
      "range search returned a pair outside the exact tau-set")
  }

  test("graphAnnSearch escapes the probed-cell horizon that caps ivfTopK") {
    import spark.implicits._
    // three cells; the query probes {c0, c1}. Vector 20 is assigned to
    // the UNPROBED c2 — ivfTopK can never return it — but the c1 bridge
    // vector 10 probes {c1, c2}, so its k-NN edges reach into c2 and the
    // graph walk finds 20 via bridge expansion: the exact recall headroom
    // the ann17/ann18 measurements quantify, as a deterministic unit case.
    val corpus = (Seq(
      (0L, Seq(1.0, 0.05)),            // the query: probes c0, c1
      (1L, Seq(0.9, 0.1)), (2L, Seq(0.92, 0.08)), (3L, Seq(0.95, 0.05)),
      (10L, Seq(0.55, 0.84)),          // bridge: assigned c1, probes {c1, c2}
      (20L, Seq(0.3, 0.95)),           // target: assigned c2 (unprobed by query)
      (21L, Seq(0.05, 0.9)), (22L, Seq(0.02, 0.95))))
      .toDF("id", "vec")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.6, 0.8)), (2L, Seq(0.0, 1.0)))
      .toDF("cell", "cvec")
    val e = corpus.select(col("id"), col("vec"))
    val ivf = SimilarityOps.ivfTopK(e, col("id") === 0, cents, k = 10, nProbe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!ivf.contains(20L), s"ivf must not see the unprobed cell: $ivf")
    val g = SimilarityOps.knnGraph(corpus, "id", "vec", cents, k = 3, nProbe = 2)
    val walked = SimilarityOps.graphAnnSearch(corpus, "id", "vec", cents, g,
        col("id") === 0, k = 10, nProbe = 2, rounds = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(walked.contains(20L),
      s"the walk must reach cell c2 via the bridge's cross-cell edges: $walked")
    assert(ivf.subsetOf(walked),
      "warm start: the walked pool must contain the full ivf result")
  }

  test("mipsTopK ranks by inner product, not cosine: norm is signal") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)),     // the query
      (1L, Seq(3f, 3f)),     // dot 3, cosine 0.707
      (2L, Seq(0.99f, 0f)),  // dot 0.99, cosine 1.0
      (3L, Seq(-1f, 0f)))    // dot -1
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.mipsTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0, k = 3)
      .orderBy("rank").select("neighbor_id", "dot_q")
      .as[(Long, Long)].collect().toSeq
    // cosine would order (2, 1, 3); MIPS must order (1, 2, 3)
    assert(got.map(_._1) == Seq(1L, 2L, 3L), s"got $got")
    // exact quantized scores: floor(3*2^20)*floor(1*2^20) etc.
    assert(got.head._2 == 3145728L * 1048576L)
  }

  test("kCenterCoreset: farthest-point traversal with min-id ties, exact integer distances") {
    // 1-D layout: 1@0, 2@10, 3@5, 4@1(y), 5@9 — greedy from min-id seed
    // picks 2 (d2=100), then 3 (25), then the 4/5 tie at 1 -> 4, then 5
    val vecs = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)), (3L, Seq(5f, 0f)),
      (4L, Seq(0f, 1f)), (5L, Seq(9f, 0f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.kCenterCoreset(vecs, "vec_id", "embedding", k = 5)
      .orderBy("round").select("vec_id", "dist2")
      .as[(Long, Long)].collect().toSeq
    val u = 1099511627776L // (2^20)^2: unit squared distance
    assert(got == Seq((1L, 0L), (2L, 100L * u), (3L, 25L * u),
      (4L, 1L * u), (5L, 1L * u)))
  }

  test("mipsTopK tie-breaks equal dots on the smaller neighbor id") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (5L, Seq(2f, 1f)), (4L, Seq(2f, -1f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.mipsTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0, k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(4L, 5L))
  }

  test("mmrDiversify: pick 1 is the relevance argmax (scaled-duplicate tie to " +
      "the smaller id); pick 2 skips the near-duplicate a plain top-k keeps") {
    // query 0 = (1,0,0); c1 and c2 = the SAME direction (cosine 1.0 to
    // each other, ~0.9 to the query, identical after scaling since
    // cosine is scale-invariant); c3 = relevance 0.8, far from c1
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0.9f, 0.4359f, 0f)),
      (2L, Seq(1.8f, 0.8718f, 0f)),
      (3L, Seq(0.8f, -0.6f, 0f)))
      .toDF("vec_id", "embedding")
    // plain top-2 keeps the duplicate pair
    val plain = SimilarityOps.bruteForceTopK(
        vecs.where(col("vec_id") === 0)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        vecs.select(col("vec_id").as("id"), col("embedding").as("vec")), k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L))
    // MMR: pick1 = 1 (rel tie 1-vs-2 -> smaller id); pick2: c2's score
    // 7·0.9e9 − 3·1e9 = 3.3e9 loses to c3's 7·0.8e9 − 3·red (red < 0.5)
    val mmr = SimilarityOps.mmrDiversify(vecs, "vec_id", "embedding",
        col("_mid") === 0, poolK = 3, k = 2, lambdaTenths = 7)
      .orderBy("pick").select("neighbor_id").as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L))
  }

  test("mmrDiversify: k picks per query, no repeats, pick order monotone in score") {
    val vecs = (0L to 9L).map(i =>
      (i, Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrDiversify(vecs, "vec_id", "embedding",
        col("_mid") < 2, poolK = 6, k = 4, lambdaTenths = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 8)
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4), s"query $q")
      assert(rows.map(_._2).distinct.length == 4, s"query $q repeats")
      assert(!rows.map(_._2).contains(q), s"query $q selected itself")
    }
  }

  test("rrfFuse: integer contributions sum across arms; ties to smaller id") {
    val arm1 = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("query_id", "neighbor_id", "rank")
    val arm2 = Seq((0L, 2L, 1), (0L, 3L, 2)).toDF("query_id", "neighbor_id", "rank")
    val got = SimilarityOps.rrfFuse(Seq(arm1, arm2), kConst = 60, topK = 10)
      .orderBy("rank")
      .select("neighbor_id", "n_arms", "rrf_nano", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    val c1 = 1000000000L / 61  // rank 1
    val c2 = 1000000000L / 62  // rank 2
    assert(got == Seq(
      (2L, 2L, c1 + c2, 1),    // both arms
      (1L, 1L, c1, 2),
      (3L, 1L, c2, 3)))
  }

  test("rrfFuse: duplicate rows within one arm collapse to best rank (VERDICT r16 #6)") {
    // arm1 emits neighbor 1 twice (ranks 1 and 3): must fuse as rank 1
    // exactly once — n_arms stays 1 per real arm, rrf_nano uninflated
    val arm1 = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 1L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val arm2 = Seq((0L, 1L, 1)).toDF("query_id", "neighbor_id", "rank")
    val got = SimilarityOps.rrfFuse(Seq(arm1, arm2), kConst = 60, topK = 10)
      .orderBy("rank")
      .select("neighbor_id", "n_arms", "rrf_nano", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    val c1 = 1000000000L / 61
    val c2 = 1000000000L / 62
    assert(got == Seq(
      (1L, 2L, c1 + c1, 1),  // dup in arm1 collapsed to rank 1, not summed
      (2L, 1L, c2, 2)))
  }

  test("simCellKey: order-isomorphic to struct(sim, -cell), decode exact " +
      "(round-18 HashAggregate rewrite)") {
    // the full 10^-6 sim grid boundaries + adversarial cells incl. the
    // 2^42-1 contract bound; struct order == long-key order pairwise
    val sims = Seq(-1.0, -0.999999, -0.5, -1e-6, 0.0, 1e-6, 0.25, 0.999999, 1.0)
    val cells = Seq(0L, 1L, 2L, 1000L, (1L << 41) - 1, (1L << 42) - 1)
    val rows = for (s0 <- sims; c <- cells) yield (s0, c)
    val df = rows.toDF("sim", "cell")
      .select(col("sim"), col("cell"),
        SimilarityOps.simCellKey(col("sim"), col("cell")).as("key"))
    val got = df.select("sim", "cell", "key")
      .as[(Double, Long, Long)].collect().toSeq
    // decode round-trips every cell exactly
    val dec = df.select(col("cell"),
        SimilarityOps.simCellKeyCell(col("key")).as("back"))
      .as[(Long, Long)].collect()
    assert(dec.forall { case (c, b) => c == b })
    // pairwise: struct(sim, -cell) lexicographic order == key order
    for (a <- got; b <- got) {
      val structLt = a._1 < b._1 || (a._1 == b._1 && -a._2 < -b._2)
      assert(structLt == (a._3 < b._3),
        s"order mismatch: $a vs $b (structLt=$structLt)")
    }
    // argmax through an actual aggregation matches the struct form
    val data = Seq((1L, 0.5, 3L), (1L, 0.5, 1L), (1L, 0.25, 0L),
      (2L, -0.75, 7L), (2L, -0.75, 2L), (2L, -1.0, 0L))
      .toDF("id", "sim", "cell")
    val viaKey = data.groupBy("id")
      .agg(max_by(col("cell"), SimilarityOps.simCellKey(col("sim"), col("cell"))).as("cell"))
      .as[(Long, Long)].collect().toMap
    val viaStruct = data.groupBy("id")
      .agg(max_by(col("cell"), struct(col("sim"), -col("cell"))).as("cell"))
      .as[(Long, Long)].collect().toMap
    assert(viaKey == viaStruct && viaKey == Map(1L -> 1L, 2L -> 2L))
  }
}
