package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals a plain inner join, including skewed keys") {
    // 1000 rows on one hot key + a tail
    val skewed = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "row_id")
    val small = (Seq(("hot", "H")) ++ (1 to 50).map(i => (s"k$i", s"V$i")))
      .toDF("key", "payload")
    val plain = skewed.join(small, Seq("key"))
      .select("key", "row_id", "payload").as[(String, Long, String)].collect().toSet
    val salted = Exec.saltedJoin(skewed, small, "key", "row_id", saltFactor = 4)
      .select("key", "row_id", "payload").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 1050)
  }
}
