package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The measured-classifier-grading floor (VERDICT r15 next-round #3):
  * tx36's harness must read F1 = 1.0 on a corpus the hashed-BoW
  * logistic regression can actually separate. The catalog's own tx36
  * reading on the synthetic corpus is chance-level BY CONSTRUCTION
  * (document text there is generated independently of the `lang` label
  * — the ann26 situation: the harness is the deliverable, the honest
  * number is low); this spec proves the harness itself discriminates.
  *
  * Corpus: positives say "hello" (md5 bucket 10 mod 16), negatives say
  * "bonjour" (bucket 4) — disjoint feature dims, perfectly separable.
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    val en = i % 2 == 0
    (i.toLong, if (en) "en" else "fr",
      if (en) "hello hello hello" else "bonjour bonjour bonjour")
  }.toDF("doc_id", "lang", "text")

  test("hashLogReg + logRegScore separate a separable corpus (F1 = 1.0)") {
    val docs = corpus(64)
    val w = TextOps.hashLogReg(docs, "text", "doc_id",
      col("lang") === "en", dims = 16, rounds = 3)
    val scored = TextOps.logRegScore(docs, "text", "doc_id", w, dims = 16)
      .join(docs.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y")), "doc_id")
    val cm = scored.agg(
      sum(when(col("pred") === 1 && col("y") === 1, 1L).otherwise(0L)),
      sum(when(col("pred") === 1 && col("y") === 0, 1L).otherwise(0L)),
      sum(when(col("pred") === 0 && col("y") === 1, 1L).otherwise(0L))).head()
    val (tp, fp, fn) = (cm.getLong(0), cm.getLong(1), cm.getLong(2))
    assert(tp == 32 && fp == 0 && fn == 0,
      s"separable corpus not separated: tp=$tp fp=$fp fn=$fn")
  }

  test("logRegScore decision boundary is the integer z_micro > 0") {
    val docs = corpus(16)
    val w = TextOps.hashLogReg(docs, "text", "doc_id",
      col("lang") === "en", dims = 16, rounds = 3)
    val bad = TextOps.logRegScore(docs, "text", "doc_id", w, dims = 16)
      .where((col("z_micro") > 0) =!= (col("pred") === 1)).count()
    assert(bad == 0)
  }

  test("logRegScore scores every nonempty doc exactly once (bias row spine)") {
    val docs = corpus(8).unionByName(
      Seq((100L, "en", "   ")).toDF("doc_id", "lang", "text"))
    val w = TextOps.hashLogReg(docs, "text", "doc_id",
      col("lang") === "en", dims = 16, rounds = 1)
    val out = TextOps.logRegScore(docs, "text", "doc_id", w, dims = 16)
    assert(out.count() == 8) // blank doc excluded, others exactly once
    assert(out.select("doc_id").distinct().count() == 8)
  }

  test("hashLogReg coerces null labels to 0 (ADVICE r15 parity with the oracle CASE)") {
    val docs = Seq(
      (1L, "en", "hello"), (2L, null.asInstanceOf[String], "bonjour"),
      (3L, "en", "hello"), (4L, "fr", "bonjour")).toDF("doc_id", "lang", "text")
    val w = TextOps.hashLogReg(docs, "text", "doc_id",
      col("lang") === "en", dims = 16, rounds = 2)
    // null-lang doc must contribute as a NEGATIVE, not vanish: its
    // feature dim (bonjour) ends with negative weight
    val wb = w.where(col("dim") === 4).head().getLong(1)
    assert(wb < 0, s"null-label doc dropped from the gradient: w(bonjour)=$wb")
  }
}
