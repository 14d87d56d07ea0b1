package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[QuantileOps.histogramThreshold]] vs the exact rank statistic: the
  * returned bin must be exactly the bin containing the ceil(q*n)-th
  * smallest value (the histogram loses resolution WITHIN a bin, never
  * across bins), and n_kept must count precisely the rows at or above
  * that bin. Checked for several quantiles on irregular, tie-heavy data.
  */
class QuantileOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val bins = 256
  private lazy val rows: Seq[(String, Double)] =
    (0 until 2000).map { i =>
      (s"g${i % 3}", math.abs(i * 2654435761L % 997).toDouble / 997.0)
    }
  private lazy val df = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  private def binOf(v: Double): Long =
    math.min(math.floor(v / (1.0 / bins)).toLong, bins - 1L)

  test("threshold bin equals the exact rank statistic's bin (q in {1/2, 9/10, 99/100})") {
    for ((num, den) <- Seq((1, 2), (9, 10), (99, 100))) {
      val got = QuantileOps.histogramThreshold(df, Seq("g"), col("v"),
          lo = 0.0, hi = 1.0, bins = bins, num = num, den = den)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      for ((g, vals) <- rows.groupBy(_._1)) {
        val sorted = vals.map(_._2).sorted
        val n = sorted.size
        val rank = (num.toLong * n + den - 1) / den // ceil(num*n/den)
        val exactBin = binOf(sorted(rank.toInt - 1))
        val (gotN, gotThr, gotKept) = got(g)
        assert(gotN == n)
        assert(gotThr == exactBin,
          s"group $g q=$num/$den: threshold bin $gotThr != exact-quantile bin $exactBin")
        assert(gotKept == sorted.count(binOf(_) >= exactBin),
          s"group $g q=$num/$den: n_kept mismatch")
      }
    }
  }

  test("values at the upper bound clamp into the last bin") {
    import spark.implicits._
    val edge = Seq(("g", 0.0), ("g", 0.5), ("g", 1.0)).toDF("g", "v")
    val r = QuantileOps.histogramThreshold(edge, Seq("g"), col("v"),
      lo = 0.0, hi = 1.0, bins = bins, num = 1, den = 1).collect().head
    // q=1 -> the threshold is the max value's bin, which must be the
    // clamped last bin despite v == hi
    assert(r.getLong(1) == 3 && r.getLong(2) == bins - 1 && r.getLong(3) >= 1)
  }

  test("discreteQuantile matches brute-force percentile_disc on integer data") {
    import spark.implicits._
    val data = Map(
      "a" -> Seq(1L, 2L, 2L, 7L, 9L),     // odd n
      "b" -> Seq(4L, 4L, 10L, 20L),       // even n: disc(0.5) = 2nd of 4
      "c" -> Seq(5L))                     // singleton
    val df = data.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }.toDF("g", "v")
    for ((num, den) <- Seq((1, 2), (1, 4), (3, 4), (1, 1))) {
      val got = QuantileOps.discreteQuantile(df, Seq("g"), "v", num, den, "q")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = data.map { case (g, vs) =>
        val sorted = vs.sorted
        val rank = (vs.size * num + den - 1) / den // ceil(num/den * n)
        g -> sorted(rank - 1)
      }
      assert(got == want, s"q=$num/$den")
    }
  }

  test("theilSen: one outlier point cannot drag the slope (hand trace)") {
    import spark.implicits._
    // y = 2x everywhere except a wild outlier at x=3
    val series = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 100L), (4L, 8L))
      .toDF("x", "y")
    val got = QuantileOps.theilSen(series, "x", "y").collect()
    assert(got.length == 1)
    val r = got.head
    // 10 pairwise slopes; sorted nano values put the six clean 2.0
    // slopes at ranks 2-7, the lower median (rank 5) lands on 2e9;
    // residuals under slope 2 are all 0 except the outlier's 94e9, so
    // the median residual (intercept) is 0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 10L, 2000000000L, 0L)))
    // contrast: the OLS slope on the same series is dragged well above 2
    // (the op's reason to exist) — brute-check here
    val xs = Seq(0d, 1d, 2d, 3d, 4d); val ys = Seq(0d, 2d, 4d, 100d, 8d)
    val n = 5d
    val ols = (n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum) /
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(ols > 10d)
  }

  test("theilSen: an exact linear series recovers slope and intercept exactly") {
    import spark.implicits._
    val series = (0L to 6L).map(x => (x, 3 * x + 7)).toDF("x", "y")
    val r = QuantileOps.theilSen(series, "x", "y").collect().head
    assert(r.getLong(2) == 3000000000L)   // slope 3
    assert(r.getLong(3) == 7000000000L)   // intercept 7
  }
}
