package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[StratifyOps]]: Hamilton apportionment must hand out exactly the
  * budget within one seat of proportionality, and the systematic draw
  * must keep exactly min(seats, population) evenly-spread ranks.
  */
class StratifyOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def seatsFor(counts: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    import spark.implicits._
    StratifyOps.largestRemainderSeats(counts.toDF("g", "c"), Seq("g"), "c", budget)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  test("largest-remainder seats: exact budget, within one seat of proportional") {
    val cases = Seq(
      (Seq(("a", 100L), ("b", 200L), ("c", 700L)), 60L),
      (Seq(("a", 1L), ("b", 1L), ("c", 1L)), 10L),
      (Seq(("a", 333L), ("b", 333L), ("c", 334L)), 100L),
      (Seq(("a", 7L), ("b", 13L), ("c", 29L), ("d", 51L)), 17L))
    cases.foreach { case (counts, b) =>
      val seats = seatsFor(counts, b)
      assert(seats.values.sum == b, s"seats must sum to the budget: $seats")
      val ctot = counts.map(_._2).sum
      counts.foreach { case (g, c) =>
        val base = b * c / ctot
        assert(seats(g) == base || seats(g) == base + 1,
          s"group $g: seats ${seats(g)} strays from base $base")
      }
    }
  }

  test("remainder ties break by group key, deterministically") {
    // four equal groups, budget 6: base 1 each, two +1 seats go to the
    // lexicographically first groups (rem all equal)
    val seats = seatsFor(Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)), 6L)
    assert(seats == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("systematic draw keeps min(seats, c) evenly spread ranks") {
    import spark.implicits._
    // group a: c=10, 3 seats -> kept ranks {4, 7, 10}; group b: c=4,
    // 6 seats (> population) -> all 4 kept; group z: 0 seats -> none
    val rows = (1 to 10).map(i => ("a", i.toLong)) ++
      (1 to 4).map(i => ("b", 100L + i)) ++ (1 to 3).map(i => ("z", 200L + i))
    val df = rows.toDF("g", "k").repartition(4)
    val seats = Seq(("a", 10L, 3L), ("b", 4L, 6L), ("z", 3L, 0L)).toDF("g", "c", "seats")
    val got = StratifyOps.stratifiedSystematic(df, Seq("g"), "k", seats, "c", "seats", "rank")
      .select("g", "k", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byG = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byG("a").map(_._3).toSeq == Seq(4L, 7L, 10L))
    assert(byG("a").map(_._2).toSeq == Seq(4L, 7L, 10L)) // k==rank here
    assert(byG("b").map(_._2).toSeq == Seq(101L, 102L, 103L, 104L))
    assert(!byG.contains("z"))
    // brute-force the stride rule for group a
    val expect = (1 to 10).filter(r => (r * 3) / 10 > ((r - 1) * 3) / 10).map(_.toLong)
    assert(byG("a").map(_._3).toSeq == expect)
  }

  test("selection is stable under repartitioning") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (s"g${i % 4}", i.toLong * 7 + (i % 13)))
    val seats = rows.groupBy(_._1).map { case (g, v) => (g, v.size.toLong) }.toSeq
      .map { case (g, c) => (g, c, c / 5) }.toDF("g", "c", "seats")
    def run(parts: Int) =
      StratifyOps.stratifiedSystematic(rows.toDF("g", "k").repartition(parts),
          Seq("g"), "k", seats, "c", "seats", "rank")
        .select("g", "k", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(2) == run(17))
  }
}
