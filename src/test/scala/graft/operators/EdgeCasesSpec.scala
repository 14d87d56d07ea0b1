package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Degenerate-input behavior: every operator must return an empty (or
  * well-defined minimal) result on empty/edge inputs rather than throw —
  * at production scale empty partitions and empty filtered subsets are
  * routine, not exceptional.
  */
class EdgeCasesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("minhashCandidates on an empty corpus is empty") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DedupOps.minhashCandidates(docs, "text", "doc_id").isEmpty)
  }

  test("connectedComponents on empty vertex/edge sets is empty") {
    val v = Seq.empty[Long].toDF("id")
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(DedupOps.connectedComponents(v, e).isEmpty)
  }

  test("connectedComponents with vertices but no edges keeps singletons") {
    val v = Seq(7L, 9L).toDF("id")
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = DedupOps.connectedComponents(v, e)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 7L, 9L -> 9L))
  }

  test("bruteForceTopK with an empty corpus is empty") {
    val q = Seq((1L, Seq(1f, 0f))).toDF("id", "vec")
    val corpus = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    assert(SimilarityOps.bruteForceTopK(q, corpus, k = 5).isEmpty)
  }

  test("quantizedCentroids on empty input is empty") {
    val df = Seq.empty[(String, Seq[Float])].toDF("cell", "vec")
    assert(SimilarityOps.quantizedCentroids(df, "cell", "vec").isEmpty)
  }

  test("exactDedup on empty input is empty; single doc keeps itself") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DedupOps.exactDedup(empty, "text", "doc_id").isEmpty)
    val one = Seq((5L, "hello")).toDF("doc_id", "text")
    val r = DedupOps.exactDedup(one, "text", "doc_id")
      .select("keep_id", "n_dups").as[(Long, Long)].head()
    assert(r == ((5L, 1L)))
  }

  test("frameSample on an empty payload yields one empty frame") {
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, "")).toDF("media_id", "text"), "text")
    val r = MultimodalOps.frameSample(df, "payload", "media_id",
      frameLen = 64, stride = 48)
      .select("frame_idx", "frame_len").as[(Int, Int)].collect()
    assert(r.toSeq == Seq((0, 0)))
  }

  test("patchGrid: full-cover tile reassembles the payload; short payloads yield none") {
    import org.apache.spark.sql.functions.{col, lit, md5}
    val txt = ("0123456789abcdef" * 4) // 64 bytes
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, txt)).toDF("media_id", "text"), "text")
    // width 8 → height 8 → one 8×8 tile = rows 0..7 concatenated = the
    // whole payload, so tile_md5 == md5(payload)
    val full = MultimodalOps.patchGrid(df, "payload", "media_id",
        width = lit(8), patch = 8, maxGrid = 4)
      .select("pr", "pc", "tile_len", "tile_md5")
      .as[(Int, Int, Int, String)].collect()
    val want = df.select(md5(col("payload"))).as[String].head()
    assert(full.toSeq == Seq((0, 0, 64, want)))
    // width 16 → height 4 < patch → no complete tile
    val none = MultimodalOps.patchGrid(df, "payload", "media_id",
      width = lit(16), patch = 8, maxGrid = 4).count()
    assert(none == 0L)
  }

  test("unigramFit and encodeStats on an empty corpus are empty, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val vocab = UnigramOps.unigramFit(empty, "text", maxLen = 4,
      minCount = 2, rounds = 1)
    assert(vocab.count() == 0L)
    assert(UnigramOps.encodeStats(empty, "text", "doc_id", vocab).count() == 0L)
  }

  test("textrankKeywords with no qualifying co-occurrence is empty") {
    // all words shorter than minLen — the graph has no nodes, and the
    // 1e12 div 0 init literal must not blow up the empty plan
    val docs = Seq((1L, "a bb c"), (2L, "dd e")).toDF("doc_id", "text")
    assert(TextOps.textrankKeywords(docs, "text", minLen = 4).count() == 0L)
  }

  test("resampleBytes on an empty payload yields an empty thumb") {
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, "")).toDF("media_id", "text"), "text")
    val r = MultimodalOps.resampleBytes(df, "payload", "media_id", target = 32)
      .select("thumb_len").as[Int].head()
    assert(r == 0)
  }

  test("batchScore loads the model once per partition, not per row") {
    val docs = (1L to 200L).map(i => (i, s"payload text $i"))
      .toDF("media_id", "text").repartition(4)
    val df = MultimodalOps.withBinaryPayload(docs, "text")
    val loads = spark.sparkContext.longAccumulator("model_loads")
    val scored = MultimodalOps.batchScore(df, "payload", "media_id",
      batchSize = 32, modelLoads = Some(loads))
    assert(scored.count() == 200)
    assert(loads.value == 4, s"expected one model load per partition, got ${loads.value}")
    // scores match the driver-side stub on a sample row
    val one = scored.where(col("media_id") === 7L).select("score").as[Long].head()
    assert(one == MultimodalOps.scoreStub("payload text 7".getBytes("UTF-8")))
  }

  test("perceptualHash64: identical payloads collide, near-identical stay close, empty absent") {
    val base = (0 until 128).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val edited = base.updated(6, 'z') // position 7 IS a stride-2 pick
    val other = (0 until 128).map(i => ('a' + (i * 11 + 3) % 26).toChar).mkString
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, base), (2L, base), (3L, edited), (4L, ""), (5L, other))
        .toDF("media_id", "text"), "text")
    val h = MultimodalOps.perceptualHash64(df, "payload", "media_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!h.contains(4L), "empty payload must have no signature")
    assert(h(1L) == h(2L), "identical payloads must collide")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(3L)) <= 8,
      s"one-byte edit moved ${ham(h(1L), h(3L))} bits")
    assert(ham(h(1L), h(5L)) > 8,
      s"unrelated payloads only ${ham(h(1L), h(5L))} bits apart")
  }

  test("sceneCuts: uniform payload is one segment; segments partition the frames") {
    // scene A: constant bytes -> every frame hashes to 0, zero cuts.
    // scene B: varied bytes appended -> the transition flips > threshold
    // bits and opens at least one new segment.
    val flat = "a" * 160
    val varied = (0 until 96).map(i => ('a' + (i * 11 + 3) % 26).toChar).mkString
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, flat), (2L, "a" * 96 + varied)).toDF("media_id", "text"), "text")
    val segs = MultimodalOps.sceneCuts(df, "payload", "media_id",
        frameLen = 64, stride = 48, threshold = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // uniform doc: exactly one segment covering frames 0..2
    assert(segs(1L).toSeq === Seq((1L, 0L, 0, 2, 3L)))
    // two-scene doc: more than one segment, and the segments tile the
    // frame sequence exactly (contiguous, disjoint, complete)
    val s2 = segs(2L)
    assert(s2.length >= 2, s"expected a cut, got ${s2.toSeq}")
    assert(s2.head._3 == 0 && s2.map(_._2).toSeq == s2.indices.map(_.toLong).toSeq)
    s2.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._4 + 1, s"gap between $a and $b")
      case _ => ()
    }
    assert(s2.map(_._5).sum == s2.last._4 + 1, "n_frames must sum to the frame count")
  }

  test("energySegments: gate, min-run filter, island boundaries, seg numbering") {
    // 8 non-overlapping 4-byte frames: 'z' (122) frames are voiced at
    // threshold 100, 'a' (97) frames are not. Layout z z a z a z z z ->
    // voiced runs {0,1}, {3}, {5,6,7}; minFrames=2 keeps {0,1} and
    // {5,6,7}, numbered 1 and 2. A doc below the gate everywhere is
    // absent entirely.
    val doc = "zzzz" * 2 + "aaaa" + "zzzz" + "aaaa" + "zzzz" * 3
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, doc), (2L, "aaaa" * 4)).toDF("media_id", "text"), "text")
    val segs = MultimodalOps.energySegments(df, "payload", "media_id",
        frameLen = 4, threshold = 100, minFrames = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    assert(segs.toSeq === Seq(
      (1L, 1, 0, 1, 2L, 2 * 4 * 122L),
      (1L, 2, 5, 7, 3L, 3 * 4 * 122L)))
  }

  test("saltedJoin on empty skewed side is empty") {
    val skewed = Seq.empty[(Long, Long)].toDF("k", "id")
    val small = Seq((1L, "x")).toDF("k", "name")
    assert(Exec.saltedJoin(skewed, small, "k", "id").isEmpty)
  }

  test("pointInInterval with empty points or empty intervals is empty") {
    val points = Seq(5L).toDF("p")
    val intervals = Seq((1L, 10L)).toDF("s", "e")
    val noPoints = Seq.empty[Long].toDF("p")
    val noIntervals = Seq.empty[(Long, Long)].toDF("s", "e")
    assert(IntervalJoin.pointInInterval(noPoints, intervals, "p", "s", "e", 4L).isEmpty)
    assert(IntervalJoin.pointInInterval(points, noIntervals, "p", "s", "e", 4L).isEmpty)
  }

  test("snapshotDiff against an empty old snapshot marks everything added") {
    val old = Seq.empty[(Long, String)].toDF("k", "v")
    val neu = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val got = SnapshotOps.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("status").as[String].collect()
    assert(got.length == 2 && got.forall(_ == "added"))
  }

  test("snapshotDiff against an empty new snapshot marks everything removed") {
    val old = Seq((1L, "a")).toDF("k", "v")
    val neu = Seq.empty[(Long, String)].toDF("k", "v")
    val got = SnapshotOps.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("status").as[String].collect()
    assert(got.toSeq == Seq("removed"))
  }

  test("KmvAggregator: empty fold is empty; k=1 keeps the single minimum") {
    val agg1 = new graft.functions.KmvAggregator(1)
    assert(agg1.zero.isEmpty)
    assert(Seq(9L, 3L, 7L, 3L).foldLeft(agg1.zero)(agg1.reduce) == Seq(3L))
    assert(agg1.merge(agg1.zero, agg1.zero).isEmpty)
  }

  test("removeCharSpans: ~10^3 islands per doc splice linearly and exactly") {
    // VERDICT r14 #4's pathological case: a boilerplate doc with
    // thousands of duplicated fragments. The old per-position
    // boundary-count splice paid O(n_chars x islands) per row
    // (~60M lambda evaluations for this doc); the linear gap splice
    // pays O(n_chars + islands). Two docs share 1000 distinct 20-char
    // fragments, each separated by per-doc-unique 10-char filler, so
    // every fragment becomes its own island in both docs and exactly
    // the fillers survive. Every filler CHARACTER must be doc-tagged
    // (tag repeated, no shared digits): a zero-padded counter filler
    // shares its digit run across docs and the islands silently extend
    // into it.
    val n = 1000
    def doc(tag: String): String =
      (0 until n).map(i => f"SHARED$i%014d" + tag * 5).mkString
    val docs = Seq((1L, doc("xA")), (2L, doc("yB"))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = DedupOps.removeCharSpans(docs, "text", "doc_id", k = 20)
      .orderBy("doc_id").collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length == 2)
    val expectA = "xA" * (5 * n)
    assert(out(0).getAs[Long]("n_chars") == 30L * n)
    assert(out(0).getAs[Long]("kept_chars") == 10L * n)
    assert(out(0).getAs[String]("clean_text") == expectA)
    assert(out(1).getAs[Long]("kept_chars") == 10L * n)
    assert(sec < 120, s"1000-island splice must complete in bounded time, took $sec s")
  }

  test("scaledAxisCount clamps to [4, 16] and grows with corpus size") {
    import SimilarityOps.scaledAxisCount
    assert(scaledAxisCount(0) == 4 && scaledAxisCount(500) == 4)
    assert(scaledAxisCount(2000) == 6)
    assert(scaledAxisCount(Long.MaxValue / 4) == 16) // cap
    val widths = Seq(1L, 100L, 10000L, 1000000L).map(scaledAxisCount(_))
    assert(widths == widths.sorted)
  }

  test("shared-tile detection: a planted common prefix shares exactly the aligned tiles") {
    // two "images" agree on the first 512 bytes and differ after: with
    // FIXED width 64 / patch 8 / maxGrid 4, the shared prefix fills
    // patch-row 0 (grid rows 0-7 x cols 0-3) -> exactly 4 shared tiles,
    // and patch-rows 1-3 (bytes 512+) differ everywhere
    val prefix = (0 until 512).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq(
      (1L, prefix + "A" * 1600),
      (2L, prefix + "B" * 1600),
      (3L, "C" * 2112)).toDF("doc_id", "text")
    val pl = MultimodalOps.withBinaryPayload(docs, "text")
    val tiles = MultimodalOps.patchGrid(pl, "payload", "doc_id",
      width = lit(64), patch = 8, maxGrid = 4)
    val shared = tiles.groupBy("tile_md5")
      .agg(countDistinct("doc_id").as("n_images"))
      .where(col("n_images") >= 2)
      .collect()
    assert(shared.length == 4, s"expected the 4 prefix tiles, got ${shared.length}")
    assert(shared.forall(_.getLong(1) == 2L))
  }

  test("round-15 serving ops: empty corpus in, empty (or no-op) out") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.pmiCollocations(noDocs, "text").isEmpty)
    assert(TextOps.contextChunks(noDocs, "text", "doc_id").isEmpty)
    assert(TextOps.featureHash(noDocs, "text", "doc_id").isEmpty)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.hits(noEdges, "src", "dst", rounds = 2).isEmpty)
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(SimilarityOps.mmrDiversify(noVecs, "vec_id", "embedding",
      col("_mid") < 5, poolK = 4, k = 2).isEmpty)
    val emptyArm = Seq.empty[(Long, Long, Int)]
      .toDF("query_id", "neighbor_id", "rank")
    assert(SimilarityOps.rrfFuse(Seq(emptyArm, emptyArm)).isEmpty)
  }

  test("mmrDiversify with a pool smaller than k returns the whole pool") {
    // 1 query + 2 candidates but k = 4: picks must stop at the pool
    val vecs = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 1f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrDiversify(vecs, "vec_id", "embedding",
        col("_mid") === 0, poolK = 8, k = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("theilSen on a single point / two points stays well-defined") {
    // one point: zero pairs -> no median slope -> empty result
    assert(QuantileOps.theilSen(Seq((3L, 5L)).toDF("x", "y"), "x", "y").isEmpty)
    // two points: exactly one pair
    val two = QuantileOps.theilSen(Seq((0L, 1L), (2L, 5L)).toDF("x", "y"),
      "x", "y").collect().head
    assert(two.getLong(1) == 1L && two.getLong(2) == 2000000000L)
  }

  test("hashLogReg: single-class corpus still trains (no div-by-zero, signs one-way)") {
    val docs = Seq((1L, "en", "a b"), (2L, "en", "a")).toDF("doc_id", "lang", "text")
    val w = TextOps.hashLogReg(docs, "text", "doc_id",
        col("lang") === "en", dims = 4, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 5)
    assert(w.values.forall(_ >= 0L), s"all-positive labels push weights up only: $w")
  }
}
