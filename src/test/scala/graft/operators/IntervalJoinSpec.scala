package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(points: Seq[Long], intervals: Seq[(String, Long, Long)],
      binWidth: Long) =
    IntervalJoin.pointInInterval(
        points.toDF("p"),
        intervals.toDF("name", "s", "e"),
        "p", "s", "e", binWidth)
      .select(col("p"), col("name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("bounds are inclusive on both ends") {
    val got = run(Seq(9L, 10L, 15L, 20L, 21L), Seq(("a", 10L, 20L)), 7L)
    assert(got == Set((10L, "a"), (15L, "a"), (20L, "a")))
  }

  test("intervals spanning many bins match without duplicates") {
    // interval spans bins 0..14 at width 7; each matching point must
    // appear exactly once even though the interval is replicated 15x
    val out = IntervalJoin.pointInInterval(
      Seq(0L, 50L, 99L, 100L, 101L).toDF("p"),
      Seq(("wide", 0L, 100L)).toDF("name", "s", "e"),
      "p", "s", "e", 7L)
    val rows = out.select("p").as[Long].collect().sorted.toSeq
    assert(rows == Seq(0L, 50L, 99L, 100L)) // no dups, 101 excluded
  }

  test("a point inside several overlapping intervals matches each once") {
    val got = run(Seq(12L), Seq(("a", 10L, 20L), ("b", 5L, 13L), ("c", 14L, 30L)), 4L)
    assert(got == Set((12L, "a"), (12L, "b")))
  }

  test("negative coordinates bin correctly (floor semantics)") {
    val got = run(Seq(-8L, -7L, -1L, 0L), Seq(("n", -7L, -1L)), 3L)
    assert(got == Set((-7L, "n"), (-1L, "n")))
  }

  test("matches the naive BETWEEN join on random-ish data") {
    val points = (0L until 200L).map(i => i * 3 % 97).toDF("p")
    val intervals = (0L until 20L).map(i => (s"i$i", i * 5, i * 5 + 11)).toDF("name", "s", "e")
    val binned = IntervalJoin.pointInInterval(points, intervals, "p", "s", "e", 8L)
      .select("p", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val naive = points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
      .select("p", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(binned == naive && naive.nonEmpty)
  }
}
