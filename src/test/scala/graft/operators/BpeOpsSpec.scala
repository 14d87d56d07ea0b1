package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** BPE merge-round semantics: leftmost-greedy merge application (the
  * textbook rule the tx19 oracle replays via list_reduce), frequency-
  * weighted pair counts, and deterministic argmax tie-breaks.
  */
class BpeOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wordsOf(ws: (String, Long)*) =
    ws.toSeq.toDF("w", "freq")
      .withColumn("seq", expr(
        "array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), char(31))"))

  private def seqs(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.select(col("w"), expr("split(seq, char(31))").as("s"))
      .as[(String, Seq[String])].collect().toMap

  test("applyMerge is leftmost-greedy: 'aaa' under (a,a) -> [aa, a]") {
    val words = wordsOf("aaa" -> 1L, "aaaa" -> 1L, "baa" -> 1L)
    val best = Seq(("a", "a")).toDF("l", "r")
    val m = seqs(BpeOps.applyMerge(words, best))
    assert(m("aaa") == Seq("aa", "a"))
    assert(m("aaaa") == Seq("aa", "aa"))
    assert(m("baa") == Seq("b", "aa"))
  }

  test("applyMerge never merges across a just-merged token") {
    // merging (a,b) in 'abab' must give [ab, ab], not chain into one token
    val words = wordsOf("abab" -> 1L, "cab" -> 1L, "ab" -> 1L, "b" -> 1L)
    val best = Seq(("a", "b")).toDF("l", "r")
    val m = seqs(BpeOps.applyMerge(words, best))
    assert(m("abab") == Seq("ab", "ab"))
    assert(m("cab") == Seq("c", "ab"))
    assert(m("ab") == Seq("ab"))
    assert(m("b") == Seq("b"))
  }

  test("pairCounts weights by word frequency; 1-symbol words contribute nothing") {
    val words = wordsOf("ab" -> 3L, "abc" -> 2L, "x" -> 100L)
    val counts = BpeOps.pairCounts(words)
      .as[(String, String, Long)].collect()
      .map { case (l, r, c) => (l, r) -> c }.toMap
    assert(counts(("a", "b")) == 5L) // 3 from 'ab' + 2 from 'abc'
    assert(counts(("b", "c")) == 2L)
    assert(counts.size == 2) // 'x' adds no pair
  }

  test("bpeMerges: 3 rounds on a crafted corpus pick the right merges in order") {
    // corpus: 'aab' x3, 'ab' x2  => round 1 pairs: (a,a)=3, (a,b)=5 -> merge (a,b)
    // after merge: 'a|ab' x3, 'ab' x2 => round 2: (a,ab)=3 -> merge (a,ab)
    val df = Seq("aab aab aab ab ab").toDF("text")
    val out = BpeOps.bpeMerges(df, "text", rounds = 2)
      .orderBy("round")
      .as[(Int, String, String, Long)].collect()
    assert(out.length == 2)
    assert(out(0) == ((1, "a", "b", 5L)))
    assert(out(1) == ((2, "a", "ab", 3L)))
  }

  test("argmax ties break by (l, r) binary order") {
    // 'ab' x2 and 'cd' x2: both pairs count 2 -> (a,b) wins over (c,d)
    val df = Seq("ab ab cd cd").toDF("text")
    val out = BpeOps.bpeMerges(df, "text", rounds = 1)
      .as[(Int, String, String, Long)].collect()
    assert(out.head == ((1, "a", "b", 2L)))
  }

  test("encodeRoundTrip: ids-only decode reconstructs every word (tx38 identity)") {
    // 'aab' x3, 'ab' x2 after 2 merges: merge1 (a,b)->ab, merge2 (a,ab).
    // Final symbols: 'aab' = [aab], 'ab' = [ab]. Vocab (binary order):
    // aab=1, ab=2.
    val df = Seq("aab aab aab ab ab").toDF("text")
    val got = BpeOps.encodeRoundTrip(df, "text", rounds = 2)
      .orderBy("word")
      .as[(String, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      ("aab", 1L, 1L, "aab"),
      ("ab", 1L, 2L, "ab")))
  }

  test("encodeRoundTrip: multi-symbol words concatenate in position order") {
    // one merge on 'ab ab cba': merge (a,b) -> 'cba' = [c, b, a]
    // vocab binary order: a=1, ab=2, b=3, c=4 -> cba id_sum = 4+3+1 = 8
    val df = Seq("ab ab cba").toDF("text")
    val got = BpeOps.encodeRoundTrip(df, "text", rounds = 1)
      .orderBy("word")
      .as[(String, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      ("ab", 1L, 2L, "ab"),
      ("cba", 3L, 8L, "cba")))
  }
}
