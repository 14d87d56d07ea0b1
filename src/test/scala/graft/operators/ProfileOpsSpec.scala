package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ProfileOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: counts, nulls, ndv, min/max, and the modal value per column") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("b")), (4L, None))
      .toDF("id", "s")
    val got = ProfileOps.profile(df, Seq(
        "id" -> col("id"), "s" -> col("s")))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = got("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 4L)
    assert(id.getString(5) == "1" && id.getString(6) == "4")
    // all ids unique: the mode ties at cnt 1 and breaks to the min value
    assert(id.getString(7) == "1" && id.getLong(8) == 1L)
    val s = got("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(5) == "a" && s.getString(6) == "b")
    assert(s.getString(7) == "b" && s.getLong(8) == 2L)
  }

  test("profile: KMV estimate is exact below k and within tolerance above") {
    val small = ProfileOps.profile(
      (1 to 10).map(_.toLong).toDF("x"), Seq("x" -> col("x")), k = 64)
      .collect()(0)
    assert(small.getLong(4) == 10L) // short of k: exact distinct-hash count
    val big = ProfileOps.profile(
      (1 to 5000).map(_.toLong).toDF("x"), Seq("x" -> col("x")), k = 64)
      .collect()(0)
    val est = big.getLong(4)
    assert(est > 2500 && est < 10000, s"KMV(64) estimate $est for ndv=5000")
  }
}
