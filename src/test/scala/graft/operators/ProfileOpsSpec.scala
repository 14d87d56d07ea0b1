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

  test("equiWidthHistogram: buckets partition the range, counts conserve mass") {
    val df = (1 to 100).map(_.toLong).toDF("x")
    val h = ProfileOps.equiWidthHistogram(df, col("x"), buckets = 8)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(h.map(_._4).sum == 100L)              // mass conserved
    assert(h.map(_._1).toSeq == (0L to 7L))      // all 8 buckets hit
    // observed ranges tile [1, 100] without overlap, in order
    h.sliding(2).foreach { case Array(a, b) => assert(a._3 < b._2) case _ => }
    // uniform data: bucket(v) = least(7, (v-1)*8 div 100) — 13 values in
    // bucket 0 (1..13), 12 or 13 thereafter
    assert(h.head._4 == 13L && h.head._2 == 1L && h.last._3 == 100L)
  }

  test("equiWidthHistogram: constant column lands in one bucket; empty input is empty") {
    val one = ProfileOps.equiWidthHistogram(
      Seq(7L, 7L, 7L).toDF("x"), col("x"), buckets = 8).collect()
    assert(one.length == 1 && one(0).getLong(0) == 0L && one(0).getLong(3) == 3L)
    assert(ProfileOps.equiWidthHistogram(
      Seq.empty[Long].toDF("x"), col("x"), buckets = 8).count() == 0)
  }

  test("equiWidthHistogram: value ranges near 2^63 don't overflow (ADVICE r16 #1)") {
    // full-Long-range data: (v − lo)·buckets and max − lo + 1 both
    // overflow long arithmetic; the decimal fallback must still produce
    // in-range, ordered, mass-conserving buckets
    val df = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue).toDF("x")
    val h = ProfileOps.equiWidthHistogram(df, col("x"), buckets = 8)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(h.map(_._4).sum == 7L)
    assert(h.forall(b => b._1 >= 0L && b._1 <= 7L), s"bucket out of range: ${h.toSeq}")
    assert(h.head._1 == 0L && h.head._2 == Long.MinValue)
    assert(h.last._1 == 7L && h.last._3 == Long.MaxValue)
    // extremes land in the extreme buckets; the mid values in the middle
    val mid = h.filter(b => b._2 <= 0L && b._3 >= 0L)
    assert(mid.forall(b => b._1 >= 3L && b._1 <= 4L), s"mid bucket: ${mid.toSeq}")
  }
}
