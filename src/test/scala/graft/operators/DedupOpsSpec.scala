package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("antiJoinNew keeps only keys absent from the existing snapshot") {
    val batch = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val existing = Seq("b", "x").toDF("k")
    val out = DedupOps.antiJoinNew(batch, existing, "k")
      .as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("c", 3)))
    // result ⊆ batch and disjoint from existing keys (J1 contract)
    assert(out.map(_._1).intersect(Set("b", "x")).isEmpty)
  }

  test("antiJoinNew does NOT dedup within the batch (reference semantics)") {
    val batch = Seq("a", "a").toDF("k")
    val out = DedupOps.antiJoinNew(batch, Seq("z").toDF("k"), "k")
    assert(out.count() == 2)
  }

  test("exactDedup groups identical texts and keeps the min id") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = DedupOps.exactDedup(docs, "text", "doc_id")
      .select("n_dups", "keep_id").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 1L), (1L, 3L)))
  }

  test("minhash candidates surface identical docs as a pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words here that share nothing at all ok"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidates(docs, "text", "doc_id",
      shingleK = 3, bands = 4, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("jaccard: identical shingle sets -> 1.0, disjoint -> 0.0") {
    val df = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d"), Seq("x y z")))
      .toDF("s1", "s2", "s3")
    val r = df.select(
      DedupOps.jaccard(col("s1"), col("s2")).as("same"),
      DedupOps.jaccard(col("s1"), col("s3")).as("diff"))
      .as[(Double, Double)].head()
    assert(r == ((1.0, 0.0)))
  }

  test("simhash: identical texts hash identically; hamming is 0") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val hs = DedupOps.simhash64(docs, "text", "doc_id")
      .select("simhash").as[Long].collect()
    assert(hs(0) == hs(1))
    val d = spark.range(1).select(
      DedupOps.hamming64(lit(hs(0)), lit(hs(1)))).as[Long].head()
    assert(d == 0L)
  }

  test("shingles: short docs fall back to one joined-token shingle") {
    val df = Seq("one two").toDF("text")
      .select(DedupOps.tokens(col("text")).as("t"))
      .select(DedupOps.shinglesFromTokens(col("t"), 3).as("sh"))
    assert(df.as[Seq[String]].head() == Seq("one two"))
  }

  test("connectedComponents: chain + triangle + singletons collapse to min id") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20}, {21}
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val got = DedupOps.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("connectedComponents: a 1000-vertex path converges inside the bound") {
    // adversarial worst case for plain hash-min label propagation (one
    // hop per round = 999 rounds); pointer jumping halves chains per
    // round, so this must converge within the default 25 iterations
    val n = 1000L
    val vertices = spark.range(n).toDF("id")
    val edges = spark.range(n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val got = DedupOps.connectedComponents(vertices, edges)
    assert(got.where(col("cluster") =!= 0L).isEmpty)
    assert(got.count() == n)
  }

  test("substringSpans: a shared verbatim passage yields run = span - k + 1") {
    // d1 and d2 embed the same 7-token passage at DIFFERENT offsets
    // (the diagonal trick must align them); d3 shares nothing
    val passage = "the quick brown fox jumps over dogs"
    val docs = Seq(
      (1L, s"alpha beta $passage gamma delta epsilon"),
      (2L, s"one two three four $passage five"),
      (3L, "entirely different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val got = DedupOps.substringSpans(docs, "text", "doc_id",
        k = 4, minRun = 1)
      .as[(Long, Long, Long, Long)].collect().toList
    // 7-token passage, k=4 -> 4 consecutive shingles; nothing else shared
    assert(got == List((1L, 2L, 4L, 4L)), s"got $got")
  }

  test("substringSpans: corpus-wide boilerplate shingles are stop-filtered") {
    // the same passage in MORE docs than maxDocsPerShingle: every one of
    // its shingles fails the rarity filter, so no pair survives — the
    // bound that keeps the self-join linear at corpus scale
    val docs = (1 to 5).map(i =>
        (i.toLong, s"header one two three four five six tail$i"))
      .toDF("doc_id", "text")
    val flagged = DedupOps.substringSpans(docs, "text", "doc_id",
      k = 4, maxDocsPerShingle = 3, minRun = 1)
    assert(flagged.isEmpty)
    // with the cap raised the same corpus pairs up
    val kept = DedupOps.substringSpans(docs, "text", "doc_id",
      k = 4, maxDocsPerShingle = 8, minRun = 1)
    assert(kept.count() == 10) // all C(5,2) pairs share the passage
  }

  test("substringSpans: interrupted repeats split into separate runs") {
    // shared shingles at positions forming two islands on one diagonal:
    // d2 repeats d1's text but replaces one middle token, so the shared
    // region splits into two shorter runs instead of one long one
    val base = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
    val broken = "a1 a2 a3 a4 a5 a6 XX a8 a9 a10 a11 a12"
    val docs = Seq((1L, base), (2L, broken)).toDF("doc_id", "text")
    val got = DedupOps.substringSpans(docs, "text", "doc_id",
        k = 3, minRun = 1)
      .as[(Long, Long, Long, Long)].collect().toList
    // prefix a1..a6: shingle starts 1..4 (run 4); suffix a8..a12: starts
    // 8..10 (run 3); the XX position breaks shingles 5..7
    assert(got == List((1L, 2L, 7L, 4L)), s"got $got")
  }

  test("incrementalSubstringSpans: spans report only new×history pairs") {
    // the passage appears in one history doc AND in two NEW docs: the
    // batch-vs-history shape must report each new doc against history but
    // NEVER the new×new pair (that is dd12's corpus self-join, not this)
    val passage = "the quick brown fox jumps over dogs"
    val hist = Seq(
      (1L, s"alpha beta $passage gamma"),
      (2L, "history doc sharing nothing with anyone at all zero")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"one two $passage three"),
      (11L, s"intro words $passage outro"),
      (12L, "fresh content with no shared passage anywhere in sight")
    ).toDF("doc_id", "text")
    val got = DedupOps.incrementalSubstringSpans(batch, hist, "text", "doc_id",
        k = 4, minRun = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    // 7-token passage, k=4 -> 4 consecutive shingles per cross pair
    assert(got == Set((10L, 1L, 4L, 4L), (11L, 1L, 4L, 4L)), s"got $got")
  }

  test("incrementalSubstringSpans: history-side stop filter uses history stats only") {
    // passage present in more HISTORY docs than maxDocsPerShingle →
    // stop-filtered (the bound that keeps daily cost O(batch)); raising
    // the cap pairs the batch doc with every history doc
    val hist = (1 to 5).map(i =>
        (i.toLong, s"header one two three four five six tail$i"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "prefix one two three four five six suffix"))
      .toDF("doc_id", "text")
    assert(DedupOps.incrementalSubstringSpans(batch, hist, "text", "doc_id",
      k = 4, maxDocsPerShingle = 3, minRun = 1).isEmpty)
    val kept = DedupOps.incrementalSubstringSpans(batch, hist, "text", "doc_id",
      k = 4, maxDocsPerShingle = 8, minRun = 1)
    assert(kept.count() == 5, "batch doc should pair with all 5 history docs")
  }

  // ---- duplicateCoverage (dd16) ----

  /** Brute-force oracle: token positions covered by any k-shingle whose
    * text occurs in at least one OTHER doc.
    */
  private def bruteCoverage(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val owners = toks.flatMap { case (id, tk) =>
      tk.sliding(k).filter(_.size == k).map(s => (s.mkString(" "), id))
    }.groupBy(_._1).map { case (s, os) => s -> os.map(_._2).distinct.size }
    toks.map { case (id, tk) =>
      val covered = tk.sliding(k).zipWithIndex.collect {
        case (s, i) if s.size == k && owners(s.mkString(" ")) >= 2 =>
          i until (i + k)
      }.flatten.toSet
      id -> (tk.size.toLong, covered.size.toLong)
    }.toMap
  }

  test("duplicateCoverage: overlapping shared spans union, never double-count") {
    val passage = "the quick brown fox jumps over the lazy dogs tonight"
    val docs = Seq(
      (1L, s"alpha beta $passage gamma"),
      (2L, s"one two three $passage"),
      (3L, "entirely different words with no overlap at all here now"),
      (4L, "tiny doc") // shorter than k: no shingles, coverage 0
    )
    val got = DedupOps.duplicateCoverage(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 4)
      .select("doc_id", "n_tok", "dup_tok").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == bruteCoverage(docs, 4), s"got $got")
    // the 10-token passage yields 7 overlapping 4-shingles in each
    // carrier but exactly 10 covered tokens — the island union, not 7*4
    assert(got(1L)._2 == 10L && got(2L)._2 == 10L)
    assert(got(3L)._2 == 0L && got(4L)._2 == 0L)
  }

  test("duplicateCoverage: within-doc repetition does not count as duplication") {
    // doc 1 repeats its own passage twice but shares nothing cross-doc:
    // countDistinct(doc) == 1 for every shingle -> coverage 0 (that axis
    // belongs to tx09/tx12)
    val docs = Seq(
      (1L, "a b c d e f a b c d e f"),
      (2L, "unrelated words only in this second document right here")
    ).toDF("doc_id", "text")
    val got = DedupOps.duplicateCoverage(docs, "text", "doc_id", k = 4)
      .select("doc_id", "dup_tok").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L), s"got $got")
  }

  test("duplicateCoverage: disjoint shared regions sum; frac is exact") {
    // docs 1/2 share HEAD, docs 1/3 share TAIL -> doc 1 covers both
    // islands; gap between them stays uncovered
    val head = "h1 h2 h3 h4"
    val tail = "t1 t2 t3 t4"
    val docs = Seq(
      (1L, s"$head gap1 gap2 gap3 $tail"),
      (2L, s"x1 x2 $head y1 y2"),
      (3L, s"z1 z2 z3 $tail w1")
    )
    val row = DedupOps.duplicateCoverage(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 4)
      .where(col("doc_id") === 1L)
      .select("n_tok", "dup_tok", "dup_frac")
      .as[(Long, Long, Double)].collect().head
    assert(row._1 == 11L && row._2 == 8L, s"got $row")
    assert(row._3 == 8.0 / 11.0)
    assert(bruteCoverage(docs, 4)(1L) == ((11L, 8L)))
  }

  // ---- noveltyScores (tx13) ----

  test("removeDuplicateSpans round trip: no shared spans -> identity (normalized)") {
    // globally unique tokens: no shingle repeats across docs, so removal
    // must be the identity on the whitespace-NORMALIZED text
    val docs = (0 until 4).map { d =>
      (d.toLong, (0 until 12).map(i => s"w${d}_$i").mkString("  ", "   ", " "))
    }.toDF("doc_id", "text")
    val out = DedupOps.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 4)
    out.foreach { case (d, nTok, kept, clean) =>
      assert(nTok == 12 && kept == 12, s"doc $d lost tokens with no dups")
      assert(clean == (0 until 12).map(i => s"w${d}_$i").mkString(" "),
        s"doc $d not identity: $clean")
    }
  }

  test("removeDuplicateSpans round trip: full overlap -> empty document") {
    val text = (0 until 16).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = DedupOps.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.length == 2)
    out.foreach { case (d, kept, clean) =>
      assert(kept == 0L && clean == "", s"doc $d not emptied: kept=$kept '$clean'")
    }
  }

  test("removeDuplicateSpans cuts exactly the shared island from both copies") {
    // 8 unique tokens ‖ 8 shared ‖ 8 unique: the shared run is one k=8
    // shingle per doc; flank-crossing shingles are globally unique, so
    // the covered island is exactly positions 9..16 in each doc
    def doc(p: String) =
      ((0 until 8).map(i => s"${p}a$i") ++ (0 until 8).map(i => s"sh$i") ++
        (0 until 8).map(i => s"${p}b$i")).mkString(" ")
    val docs = Seq((1L, doc("x")), (2L, doc("y"))).toDF("doc_id", "text")
    val out = DedupOps.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(_._2).toSeq == Seq(24L, 24L))
    assert(out.map(_._3).toSeq == Seq(16L, 16L), s"kept: ${out.toSeq}")
    val expect = Map(1L -> "x", 2L -> "y").map { case (d, p) =>
      d -> ((0 until 8).map(i => s"${p}a$i") ++ (0 until 8).map(i => s"${p}b$i"))
        .mkString(" ")
    }
    out.foreach { case (d, _, _, clean) =>
      assert(clean == expect(d), s"doc $d spliced wrong: $clean")
    }
  }

  test("removeDuplicateSpans agrees with duplicateCoverage: kept = n_tok - dup_tok") {
    // the two operators share the island machinery; the splice must keep
    // exactly the uncovered tokens on a corpus with messy overlaps
    val base = (0 until 40).map(i => s"c$i")
    val docs = Seq(
      (1L, base.take(30).mkString(" ")),
      (2L, base.slice(10, 40).mkString(" ")),
      (3L, (base.slice(5, 25) ++ Seq("zz1", "zz2")).mkString(" ")))
      .toDF("doc_id", "text")
    val cov = DedupOps.duplicateCoverage(docs, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rem = DedupOps.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rem.keySet == cov.keySet)
    rem.foreach { case (d, (nTok, kept)) =>
      assert(nTok == cov(d)._1)
      assert(kept == nTok - cov(d)._2,
        s"doc $d: kept $kept != n_tok $nTok - dup ${cov(d)._2}")
    }
  }

  test("noveltyScores: first writer scores 1.0, the later copy loses the span") {
    val passage = "p1 p2 p3 p4 p5 p6"
    val docs = Seq(
      (1L, s"a1 a2 $passage a3"),          // earliest carrier: all novel
      (2L, s"b1 b2 b3 b4 b5 b6 b7 b8"),    // unique content: all novel
      (3L, s"c1 c2 c3 $passage"),          // copies doc 1's passage
      (4L, "short")                        // < k tokens: absent
    ).toDF("doc_id", "text")
    val got = DedupOps.noveltyScores(docs, "text", "doc_id", k = 4)
      .select("doc_id", "n_shingles", "n_novel").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc1: 9 tokens -> 6 shingles, all first occurrences
    // doc3: 9 tokens -> 6 shingles; the 3 pure passage shingles were
    // first written by doc1, the 3 bridging c-token shingles are novel
    assert(got(1L) == ((6L, 6L)), s"got $got")
    assert(got(2L) == ((5L, 5L)), s"got $got")
    assert(got(3L) == ((6L, 3L)), s"got $got")
    assert(!got.contains(4L))
  }

  test("noveltyScores: within-doc repeats are novel only via first ownership") {
    // one doc repeating its own passage: it IS the earliest carrier of
    // every shingle, so everything counts novel (cross-doc order metric,
    // not within-doc repetition — that axis is tx09/tx12)
    val docs = Seq((7L, "a b c d a b c d")).toDF("doc_id", "text")
    val got = DedupOps.noveltyScores(docs, "text", "doc_id", k = 4)
      .select("n_shingles", "n_novel").as[(Long, Long)].collect().head
    assert(got == ((5L, 5L)), s"got $got")
  }

  test("lshCandidateCurve: exact dups always retrieved, disjoint docs never") {
    // ids < queryMax are queries; 0 and 1 are exact duplicates (j = 1 ->
    // identical signatures -> every band matches), 2 shares nothing with
    // anyone (j = 0 -> no band can match except by md5 collision)
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "zz yy xx vv uu tt ss rr"),
      (3L, "w1 w2 w3 w4 w5 qq pp oo"))
      .toDF("doc_id", "text")
    val got = DedupOps.lshCandidateCurve(docs, "text", "doc_id",
        queryMax = 10L, shingleK = 3, bands = 4, rowsPerBand = 4)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // universe: all 6 unordered pairs. Pair (0,1) is the only j=1 pair.
    assert(got.values.map(_._1).sum == 6L, s"universe must be all pairs: $got")
    assert(got(9) == ((1L, 1L, 1.0)), s"exact dup must be bucket 9, hit: $got")
    // bucket 0 holds the doc-2 pairs (j = 0); none can be candidates
    assert(got(0)._2 == 0L, s"disjoint docs can never share a band: $got")
  }

  // ---- character-exact ExactSubstr (dd24) ----

  test("removeCharSpans: no shared grams -> exact raw identity (no normalization)") {
    val docs = Seq(
      (1L, "completely unrelated first document   with odd  spacing"),
      (2L, "a second body of text sharing nothing twenty-char long"))
      .toDF("doc_id", "text")
    val out = DedupOps.removeCharSpans(docs, "text", "doc_id", k = 20)
      .orderBy("doc_id").collect()
    docs.orderBy("doc_id").collect().zip(out).foreach { case (in, o) =>
      assert(o.getAs[String]("clean_text") == in.getAs[String]("text"),
        "untouched docs must splice back byte-for-byte, spacing included")
      assert(o.getAs[Long]("kept_chars") == o.getAs[Long]("n_chars"))
    }
  }

  test("char grams catch a tokenization-variant duplicate token shingles miss") {
    // the same 9-token passage appears verbatim in both docs, but doc 2
    // glues its first and last words to surrounding context (whitespace
    // removed at the boundaries): only 7 interior tokens align, so no
    // 8-TOKEN shingle is shared and dd12's machinery is structurally
    // blind to it — while the 43 raw characters match exactly
    val shared = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"
    val textA = s"alpha beta $shared gamma delta"
    val textB = s"omega psi$shared" + "chi rho"
    val docs = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")

    val tokenSpans = DedupOps.substringSpans(docs, "text", "doc_id",
      k = 8, maxDocsPerShingle = 8, maxOcc = 32, minRun = 1)
    assert(tokenSpans.count() == 0,
      "8-token shingles must miss the boundary-glued duplicate")

    val charPairs = DedupOps.charSpans(docs, "text", "doc_id", k = 20)
      .collect()
    assert(charPairs.length == 1 && charPairs.head.getAs[Long]("max_run") ==
      (shared.length - 20 + 1).toLong,
      s"char grams must report the pair with the full ${shared.length}-char run")

    val cleaned = DedupOps.removeCharSpans(docs, "text", "doc_id", k = 20)
      .orderBy("doc_id").collect()
    assert(cleaned(0).getAs[String]("clean_text") == textA.replace(shared, ""))
    assert(cleaned(1).getAs[String]("clean_text") == textB.replace(shared, ""))
    cleaned.foreach { r =>
      assert(r.getAs[Long]("n_chars") - r.getAs[Long]("kept_chars") ==
        shared.length.toLong,
        "exactly the shared characters are cut from BOTH copies")
    }
  }

  test("removeCharSpans: fully duplicated doc splices to empty") {
    val t = "this entire body is duplicated verbatim across both documents"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = DedupOps.removeCharSpans(docs, "text", "doc_id", k = 20)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getAs[String]("clean_text") == "")
      assert(r.getAs[Long]("kept_chars") == 0L)
    }
  }

  // ---- winnowed fingerprints (dd25) ----

  test("winnowing guarantee: a shared span of w+k-1 chars always shares a fingerprint") {
    // k=20, w=12: the published bound says any shared substring of
    // length >= 31 has every copy select the same minimum inside the
    // window that fits entirely within the span
    val shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ01234" // 31 chars = w+k-1
    assert(shared.length == 31)
    val docs = Seq(
      (1L, s"left context one $shared right padding text"),
      (2L, s"totally different words ${shared} other tail here"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.winnowedPairs(docs, "text", "doc_id", k = 20, w = 12)
      .collect()
    assert(pairs.length == 1 && pairs.head.getAs[Long]("id1") == 1L
      && pairs.head.getAs[Long]("id2") == 2L
      && pairs.head.getAs[Long]("n_shared_fp") >= 1L,
      s"the >= w+k-1 span must be detected: ${pairs.mkString(",")}")
  }

  test("winnowing density: selected fingerprints are a small sample of the grams") {
    // a long low-repetition doc: the expected density is 2/(w+1) ~ 15%
    val body = (1 to 400).map(i => (i * 2654435761L % 977).toString).mkString(" ")
    val docs = Seq((1L, body)).toDF("doc_id", "text")
    val grams = DedupOps.positionalCharGrams(docs, "text", "doc_id", 20).count()
    val fps = DedupOps.winnowedFingerprints(docs, "text", "doc_id", k = 20, w = 12)
      .count()
    assert(fps > 0 && fps < grams / 3,
      s"winnowed index must be a sparse sample: $fps of $grams grams")
  }

  test("winnowed pairs are a subset of charSpans pairs (no false candidates)") {
    val shared = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG" // 43 chars
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"omega psi$shared" + "chi rho"),
      (3L, "nothing in common with anyone at all here"))
      .toDF("doc_id", "text")
    val winnow = DedupOps.winnowedPairs(docs, "text", "doc_id", k = 20, w = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupOps.charSpans(docs, "text", "doc_id", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(winnow.nonEmpty && winnow.subsetOf(exact),
      s"every fingerprint pair must verify exactly: $winnow vs $exact")
  }

  test("winnowDetectionCurve: guaranteed buckets read 1.0; every truth pair is graded") {
    // one doc pair per span length; pair i shares exactly one span of
    // spanLens(i) chars. Span content carries the pair id in every
    // 20-gram (period-10 pattern) so spans never collide across pairs;
    // fillers carry a per-DOC letter so no gram crosses docs. Buckets
    // land at 20, 24, 28 (the 31-char guarantee boundary), 32, 40 —
    // every bucket at or above w+k-1 = 31 must read rate 1.0 (Schleimer
    // guarantee; no stop caps bite here), and each pair appears in the
    // truth exactly once.
    val spanLens = Seq(20, 25, 31, 35, 60)
    val docs = spanLens.zipWithIndex.flatMap { case (len, i) =>
      val pat = f"$i%04dabcdef"
      val span = (pat * (len / 10 + 2)).take(len)
      // fillers are LETTER-ONLY and per-doc: a filler sharing even its
      // last character with the other doc's filler silently extends
      // every span by one (observed: digit-tagged fillers shifted all
      // guarantee buckets up one)
      Seq((2L * i + 1, "Uu" * 6 + span + "Vv" * 6),
          (2L * i + 2, "Xx" * 6 + span + "Yy" * 6))
    }.toDF("doc_id", "text")
    val curve = DedupOps.winnowDetectionCurve(docs, "text", "doc_id",
        k = 20, w = 12)
      .collect()
      .map(r => (r.getAs[Long]("bucket_lo"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_detected"), r.getAs[Long]("rate_nano")))
    assert(curve.map(_._2).sum == spanLens.size.toLong,
      s"every pair graded exactly once: ${curve.mkString(",")}")
    // L=31 -> bucket 28, L=35 -> 32, L=60 -> open bucket 40
    val guaranteed = curve.filter(c => Seq(28L, 32L, 40L).contains(c._1))
    assert(guaranteed.size == 3 && guaranteed.forall(c =>
      c._2 == c._3 && c._4 == 1000000000L),
      s"spans >= w+k-1 must all be detected: ${curve.mkString(",")}")
  }

  test("jaccardJoinExact: complete and exact vs brute force (zero false negatives)") {
    import spark.implicits._
    // staggered shared word runs -> a spread of pairwise Jaccards above
    // and below tau, plus short-doc fallback shingles and a disjoint doc
    val docs = (0 until 18).map { i =>
      (i.toLong, (0 until 10).map(j => s"w${i * 2 + j}").mkString(" "))
    } ++ Seq(
      (100L, "w0 w1"),                       // < 3 tokens: fallback shingle
      (101L, "w0 w1"),                       // its exact twin (J = 1)
      (102L, "zz yy xx ww vv uu tt ss"))     // disjoint
    val df = docs.toDF("doc_id", "text")
    def shingleSet(text: String): Set[String] = {
      val t = text.trim.split("\\s+").toSeq
      if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
      else Set(t.mkString(" "))
    }
    val sets = docs.map { case (id, tx) => id -> shingleSet(tx) }.toMap
    val expect = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size
      u = sets(a).size + sets(b).size - i
      if i * 2 >= u // J >= 1/2 via integer cross-multiplication
    } yield (a, b, i.toLong)).toSet
    assert(expect.nonEmpty && expect.exists(_._3 > 1))
    val got = DedupOps.jaccardJoinExact(df, "doc_id", "text", num = 1, den = 2)
      .select("id1", "id2", "n_common")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect, s"missing: ${expect -- got}; extra: ${got -- expect}")
  }

  test("jaccardJoinStats: raw/cand/verify counts replicate the prefix-filter math exactly") {
    import spark.implicits._
    val docs = (0 until 18).map { i =>
      (i.toLong, (0 until 10).map(j => s"w${i * 2 + j}").mkString(" "))
    } ++ Seq((100L, "w0 w1"), (101L, "w0 w1"),
      (102L, "zz yy xx ww vv uu tt ss"))
    val df = docs.toDF("doc_id", "text")
    def shingleSet(text: String): Set[String] = {
      val t = text.trim.split("\\s+").toSeq
      if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
      else Set(t.mkString(" "))
    }
    val sets = docs.map { case (id, tx) => id -> shingleSet(tx) }.toMap
    // replicate the operator's rarity-first order: (min(f, 2^23-1)*2^40
    // + first-10-hex-of-md5, shingle-string tiebreak)
    val freq = sets.values.toSeq.flatten.groupBy(identity).map { case (s, xs) =>
      s -> xs.size.toLong
    }
    def h40(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(5).map("%02x".format(_)).mkString, 16)
    def key(s: String): (Long, String) =
      (math.min(freq(s), 8388607L) * 1099511627776L + h40(s), s)
    // prefix = first n - ceil(tau*n) + 1 shingles, tau = 1/2
    val prefixes = sets.map { case (id, ss) =>
      val n = ss.size
      id -> ss.toSeq.sortBy(key).take(n - (n + 1) / 2 + 1).toSet
    }
    // raw = one row per shared PREFIX shingle per length-bound-passing
    // pair; cand = distinct pairs; verify = sum of FULL intersections
    // over candidates
    val ids = sets.keys.toSeq.sorted
    var expRaw = 0L; var expCand = 0L; var expVer = 0L
    for (a <- ids; b <- ids if a < b) {
      val (n1, n2) = (sets(a).size.toLong, sets(b).size.toLong)
      if (math.min(n1, n2) * 2 >= math.max(n1, n2) * 1) {
        val shared = (prefixes(a) & prefixes(b)).size
        expRaw += shared
        if (shared > 0) { expCand += 1; expVer += (sets(a) & sets(b)).size }
      }
    }
    val (raw, cand, ver) =
      DedupOps.jaccardJoinStats(df, "doc_id", "text", num = 1, den = 2)
    assert((raw, cand, ver) == ((expRaw, expCand, expVer)),
      s"got ($raw,$cand,$ver) want ($expRaw,$expCand,$expVer)")
    // and the invariant chain the telemetry relies on at scale
    assert(raw >= cand && ver >= cand)
  }

  test("fuzzyJoinBlocked links typos within the block and picks the best match") {
    val master = Seq((1L, "alphabet"), (2L, "alphabets"), (3L, "beta soup"))
      .toDF("mid", "mname")
    val dirty = Seq(
      (10L, "alphabet"),   // exact: dist 0 to master 1 (also 1 to master 2)
      (11L, "alphabex"),   // 1 sub: matches 1 (dist 1) and 2 (dist 2)
      (12L, "xlphabet"),   // prefix broken -> different block, no match
      (13L, "beta soux"))  // 1 sub within block of master 3
      .toDF("did", "dname")
    val got = DedupOps.fuzzyJoinBlocked(dirty, "did", "dname",
        master, "mid", "mname")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((10L, 1L, 0, 2L), (11L, 1L, 1, 2L), (13L, 3L, 1, 1L)))
  }

  test("incrementalClusters: batch merges two old clusters; untouched clusters pass through") {
    // history: clusters {1,2} (label 1), {4,7} (label 4), isolated 8
    val oldRoster = Seq((1L, 1L), (2L, 1L), (4L, 4L), (7L, 4L), (8L, 8L))
      .toDF("doc_id", "cluster")
    // batch doc 5 bridges both clusters; batch doc 10 is isolated
    val batch = Seq(5L, 10L).toDF("doc_id")
    val batchEdges = Seq((5L, 2L), (5L, 4L)).toDF("src", "dst")
    val got = DedupOps.incrementalClusters(oldRoster, batch, batchEdges, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 7L -> 1L, 5L -> 1L,
      8L -> 8L, 10L -> 10L))
  }

  test("incrementalClusters: a batch doc can become the new min label") {
    // old cluster {4,7} label 4; batch doc 3 joins it -> global min 3
    val oldRoster = Seq((4L, 4L), (7L, 4L)).toDF("doc_id", "cluster")
    val got = DedupOps.incrementalClusters(oldRoster, Seq(3L).toDF("doc_id"),
        Seq((3L, 7L)).toDF("src", "dst"), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L, 4L -> 3L, 7L -> 3L))
  }

  test("fuzzyJoinBlocked ties break on the smaller master id") {
    val master = Seq((7L, "samesame"), (5L, "samesame")).toDF("mid", "mname")
    val dirty = Seq((1L, "samesame")).toDF("did", "dname")
    val got = DedupOps.fuzzyJoinBlocked(dirty, "did", "dname",
        master, "mid", "mname").collect()
    assert(got.length == 1 && got(0).getLong(1) == 5L && got(0).getLong(3) == 2L)
  }
}
