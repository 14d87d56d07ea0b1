package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c.as("v")).as[T].head()

  test("tokenCount handles whitespace runs and empties") {
    assert(one[Int](TextOps.tokenCount(col("text")), "  a  b\tc ") == 3)
    assert(one[Int](TextOps.tokenCount(col("text")), "") == 0)
    assert(one[Int](TextOps.tokenCount(col("text")), "   ") == 0)
    assert(one[Int](TextOps.tokenCount(col("text")), "word") == 1)
  }

  test("punctCount counts only punctuation chars") {
    assert(one[Int](TextOps.punctCount(col("text")), "a, b. c! d? e; f:") == 6)
    assert(one[Int](TextOps.punctCount(col("text")), "no punct here") == 0)
  }

  test("stopwordRatio is fraction of stopword tokens") {
    assert(one[Double](TextOps.stopwordRatio(col("text")), "the cat and a dog") == 0.6)
  }

  test("langId: CJK wins; marker words pick the language; en default") {
    assert(one[String](TextOps.langId(col("text")), "中文文本") == "zh")
    assert(one[String](TextOps.langId(col("text")), "le chat est une merveille") == "fr")
    assert(one[String](TextOps.langId(col("text")), "el perro es una maravilla") == "es")
    assert(one[String](TextOps.langId(col("text")), "der hund ist und das haus") == "de")
    assert(one[String](TextOps.langId(col("text")), "the dog is a marvel") == "en")
    assert(one[String](TextOps.langId(col("text")), "nothing special") == "en")
  }

  test("fingerprint: equal texts agree, prefix-shifted texts share shingle minima") {
    val a = one[String](TextOps.fingerprint(col("text")), "abcdefghijklmnopqrstuvwxyz0123456789")
    val b = one[String](TextOps.fingerprint(col("text")), "abcdefghijklmnopqrstuvwxyz0123456789")
    assert(a == b && a.length == 32)
    // short text: md5 of the whole text
    assert(one[String](TextOps.fingerprint(col("text")), "short") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("short".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("qualityScore stays in [0,1] on varied inputs") {
    for (t <- Seq("", "a", "the and of in to is", "!!!!....;;;;", "x" * 1000)) {
      val q = one[Double](TextOps.qualityScore(col("text")), t)
      assert(q >= 0.0 && q <= 1.0, s"score $q out of range for '$t'")
    }
  }
}
