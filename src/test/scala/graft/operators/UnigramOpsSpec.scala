package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unigram-LM tokenizer training (Kudo 2018) on a hand-computable
  * corpus. Words: abab×2, ab×2, cd×1 (maxLen 4, minCount 2, 2 EM
  * rounds). Worked by hand:
  *
  *  - seed: a6 b6 ab6 ba2 aba2 bab2 abab2 + singles c1 d1 (cd cnt 1
  *    dies to minCount); T=28, P=9.
  *  - round-1 Viterbi: "abab" → whole-word piece (lp −2.512 beats
  *    ab+ab −3.330), "ab" → [ab], "cd" → [c, d]. Counts: abab 2, ab 2,
  *    c 1, d 1; ba/aba/bab/a/b zero. Prune: multi counts
  *    {2,0,0,0,2} → 0.2-quantile 0, zero-count multi die → survivors
  *    a b c d ab abab; M-step denom T+P = 6+6 = 12.
  *  - round-2 replays identically (fixed point).
  */
class UnigramOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unigramFit: EM keeps the whole-word piece and prunes dead seeds") {
    val docs = Seq(
      (1L, "abab ab abab"),
      (2L, "ab cd")).toDF("doc_id", "text")
    val out = UnigramOps.unigramFit(docs, "text", maxLen = 4,
        minCount = 2, rounds = 2)
      .orderBy("piece")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = Seq(
      ("a", 0L, -2484906650L),
      ("ab", 2L, -1386294361L),
      ("abab", 2L, -1386294361L),
      ("b", 0L, -2484906650L),
      ("c", 1L, -1791759469L),
      ("d", 1L, -1791759469L))
    assert(out.toSeq == expected)
  }

  test("viterbiCounts backtrack prefers the longest piece on tied scores") {
    // pieces a, b, ab with lp chosen so a+b exactly ties ab:
    // lp(ab) = -40, lp(a) = lp(b) = -20. The backtrack's min-start rule
    // must pick [ab], not [a, b], on both engines.
    val words = Seq(("ab", 1L)).toDF("w", "freq")
    val pieces = Seq(("a", -20L), ("b", -20L), ("ab", -40L))
      .toDF("piece", "lp")
    val got = UnigramOps.viterbiCounts(words, pieces, maxLen = 4)
      .orderBy("piece").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("ab", 1L)))
  }

  test("encodeStats: corpus mapped via one distinct-word segmentation join") {
    // same corpus, encoded under its own trained vocab: "abab" and "ab"
    // are whole pieces, "cd" (pruned at seed) falls back to [c, d].
    // doc1 = abab ab abab → 3 words / 10 chars / 3 pieces → 300 p/kchar;
    // doc2 = ab cd → 2 words / 4 chars / 3 pieces → 750 p/kchar.
    val docs = Seq(
      (1L, "abab ab abab"),
      (2L, "ab cd")).toDF("doc_id", "text")
    val vocab = UnigramOps.unigramFit(docs, "text", maxLen = 4,
      minCount = 2, rounds = 2)
    val got = UnigramOps.encodeStats(docs, "text", "doc_id", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 10L, 3L, 300L),
      (2L, 2L, 4L, 3L, 750L)))
  }

  test("every word stays segmentable after aggressive pruning") {
    // single characters are never pruned, so even a corpus whose every
    // multi-char seed dies still segments (chars only)
    val docs = Seq((1L, "xy zw")).toDF("doc_id", "text")
    val out = UnigramOps.unigramFit(docs, "text", maxLen = 4,
        minCount = 10, rounds = 2)
      .orderBy("piece").collect().map(_.getString(0))
    assert(out.toSeq == Seq("w", "x", "y", "z"))
  }

  // ---- encodeRoundTrip: decode(encode(w)) == w with byte fallback ----

  private def trainedVocab() = UnigramOps.unigramFit(
    Seq((1L, "abab ab abab"), (2L, "ab cd")).toDF("doc_id", "text"),
    "text", maxLen = 4, minCount = 2, rounds = 2)

  test("encodeRoundTrip: covered words round-trip with zero fallback") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "abab ab cd")).toDF("doc_id", "text")
    val got = UnigramOps.encodeRoundTrip(docs, "text", trainedVocab())
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("ab", 1L, 0L, "ab"), ("abab", 1L, 0L, "abab"), ("cd", 2L, 0L, "cd")))
  }

  test("encodeRoundTrip: emoji / CJK / control chars fall back per UTF-8 byte and decode back") {
    import org.apache.spark.sql.functions._
    // vocab trained on ASCII only; these words carry chars no piece covers.
    // UTF-8 widths: 中 = 3 bytes, 😀 = 4 bytes, BEL (\u0007) = 1 byte.
    val words = Seq("ab中ab", "a😀b", "a\u0007b", "中中")
      .map(w => (0L, w)).toDF("doc_id", "tok")
    val got = UnigramOps.encodeRoundTrip(
        words.sparkSession.emptyDataFrame.withColumn("text", lit("")), "text",
        trainedVocab(), tokenTable = Some(words))
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byWord = got.map(t => t._1 -> t).toMap
    // identity holds for every word
    got.foreach { case (w, _, _, rt) => assert(rt == w, s"round-trip broke: $w -> $rt") }
    assert(byWord("ab中ab")._3 == 3L)   // one CJK char = 3 fallback bytes
    assert(byWord("a😀b")._3 == 4L) // one emoji = 4 fallback bytes
    assert(byWord("a\u0007b")._3 == 1L)     // control char = 1 byte
    assert(byWord("中中")._2 == 6L) // byte pieces count per byte
  }

  test("encodeRoundTrip: dropPiecePred induces OOV and fallback covers it") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "abab ab cd")).toDF("doc_id", "text")
    val got = UnigramOps.encodeRoundTrip(docs, "text", trainedVocab(),
        dropPiecePred = col("piece").contains("c"))
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // 'cd' loses its 'c' piece → c is a 1-byte fallback, d a normal piece
    assert(got.toSeq == Seq(
      ("ab", 1L, 0L, "ab"), ("abab", 1L, 0L, "abab"), ("cd", 2L, 1L, "cd")))
  }
}
