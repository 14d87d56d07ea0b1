package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[PrefixSumOps.exclusiveRunningSum]] must equal the single-window
  * running sum for ANY bucket width — the bucketed decomposition argument
  * (offset of a row = earlier buckets' total + earlier rows in its own
  * bucket) made executable, including widths that degenerate to one row
  * per bucket (1) and one bucket per group (10^6). The auto variant must
  * additionally keep the offsets table ~sqrt(range) and plan UNHINTED
  * (the round-7 verdict's last unbounded forced broadcast).
  */
class PrefixSumOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 3 groups x 400 rows; sparse, irregular order keys (gaps, not aligned
  // to bucket boundaries) and values with many zeros
  private lazy val df = {
    import spark.implicits._
    (0 until 1200).map { i =>
      (s"g${i % 3}", i.toLong * 7 + (i % 5), math.abs((i * 2654435761L) % 13) - 3)
    }.toDF("g", "ord", "v")
  }

  private lazy val expected = {
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum("v").over(w) - col("v"))
      .select("g", "ord", "cum").collect().toSet
  }

  test("matches the single-window form for bucketWidth in {1, 3, 256, 1000000}") {
    for (b <- Seq(1L, 3L, 256L, 1000000L)) {
      val got = PrefixSumOps.exclusiveRunningSum(df, Seq("g"), "ord", "v",
          outCol = "cum", bucketWidth = b)
        .select("g", "ord", "cum").collect().toSet
      assert(got == expected, s"diverged from the single window at bucketWidth=$b")
    }
  }

  test("auto variant matches the single-window form") {
    val got = PrefixSumOps.exclusiveRunningSumAuto(df, Seq("g"), "ord", "v",
        outCol = "cum")
      .select("g", "ord", "cum").collect().toSet
    assert(got == expected)
  }

  test("auto bucket width bounds the offsets table at ~sqrt(range) per group") {
    // Order keys span ~[0, 1200*7); auto width = ceil(sqrt(range)), so the
    // offsets table (one row per non-empty bucket per group) is at most
    // groups * ceil(range/width) ≈ 3 * sqrt(8400) ≈ 276 rows — NOT the
    // ~n/width a fixed small width gives. Recompute the bound exactly from
    // the data and assert the phase-2 reduction honours it.
    val Array(lo, hi) = df.agg(min("ord"), max("ord")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val range = hi - lo + 1
    val width = PrefixSumOps.bucketWidthFor(range)
    assert(width >= math.sqrt(range.toDouble).toLong,
      "width must scale with the order range, not stay fixed")
    val offsetsRows = df
      .groupBy(col("g"), expr(s"ord div $width")).count().count()
    val groups = 3L
    assert(offsetsRows <= groups * (range / width + 1),
      s"offsets table $offsetsRows rows exceeds the per-group range/width bound")
  }

  test("auto variant plans no broadcast hint (AQE decides — tx08 discipline)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val qe = PrefixSumOps.exclusiveRunningSumAuto(df, Seq("g"), "ord", "v",
      outCol = "cum").queryExecution
    assert(qe.analyzed.collectFirst { case h: ResolvedHint => h }.isEmpty,
      "the offsets join must stay unhinted: a forced broadcast is only " +
        "bounded if the width scales, which the hint cannot express")
  }

  test("empty input yields an empty result, not a crash") {
    val out = PrefixSumOps.exclusiveRunningSumAuto(df.where(lit(false)),
      Seq("g"), "ord", "v", outCol = "cum")
    assert(out.count() == 0)
  }

  test("passes input columns through and appends only outCol") {
    val out = PrefixSumOps.exclusiveRunningSum(df, Seq("g"), "ord", "v",
      outCol = "cum", bucketWidth = 64)
    assert(out.columns.toSet == Set("g", "ord", "v", "cum"))
    assert(out.count() == df.count())
  }

  // ---- takeUntilBudget (dp13's kernel) ----

  // non-negative values for the budget tests (token counts can't be < 0)
  private lazy val tok = {
    import spark.implicits._
    (0 until 900).map { i =>
      (s"g${i % 3}", i.toLong * 7 + (i % 5), math.abs((i * 2654435761L) % 13))
    }.toDF("g", "ord", "v")
  }

  /** Brute-force oracle: per group, walk rows in `ord` order keeping
    * while the exclusive running total is below the budget.
    */
  private def bruteTake(budgets: Map[String, Long]): Set[(String, Long)] = {
    val rows = tok.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.toSeq.flatMap { case (g, rs) =>
      val budget = budgets.getOrElse(g, 0L)
      var cum = 0L
      rs.sortBy(_._2).flatMap { case (_, ord, v) =>
        val keep = cum < budget
        cum += v
        if (keep) Some((g, ord)) else None
      }
    }.toSet
  }

  test("takeUntilBudget matches the brute-force walk, boundary row kept") {
    import spark.implicits._
    val budgets = Map("g0" -> 100L, "g1" -> 1L, "g2" -> 987L)
    val bdf = budgets.toSeq.toDF("g", "budget")
    val got = PrefixSumOps.takeUntilBudget(tok, Seq("g"), "ord", "v", bdf)
      .select("g", "ord").as[(String, Long)].collect().toSet
    val want = bruteTake(budgets)
    assert(got == want, s"diff: ${(got -- want) ++ (want -- got)}")
    // budget 1 with a zero-valued first row: rows are kept while the
    // exclusive cum stays < 1, i.e. every leading zero-token row AND the
    // first positive row — the boundary-crossing row is IN (overflow-take)
    assert(want.count(_._1 == "g1") >= 1)
  }

  test("takeUntilBudget: zero budget keeps nothing; total budget keeps all") {
    import spark.implicits._
    // budget = total + 1: strictly above every exclusive prefix, so all
    // rows keep. (Exactly total would drop a TRAILING zero-value row —
    // its exclusive prefix already equals the whole budget.)
    val totals = tok.groupBy("g").agg((sum("v") + 1).as("budget"))
    val all = PrefixSumOps.takeUntilBudget(tok, Seq("g"), "ord", "v", totals)
    assert(all.count() == tok.count(), "budget > group total must keep every row")
    val none = PrefixSumOps.takeUntilBudget(tok, Seq("g"), "ord", "v",
      Seq(("g0", 0L), ("g1", 0L), ("g2", 0L)).toDF("g", "budget"))
    assert(none.count() == 0, "budget 0 must keep nothing")
  }

  test("takeUntilBudget: groups absent from the budget table keep nothing") {
    import spark.implicits._
    val out = PrefixSumOps.takeUntilBudget(tok, Seq("g"), "ord", "v",
        Seq(("g1", 50L)).toDF("g", "budget"))
      .select("g").distinct().as[String].collect().toSet
    assert(out == Set("g1"))
  }

  test("takeUntilBudget plans no broadcast hint and no low-card group window") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val bdf = Seq(("g0", 10L), ("g1", 10L), ("g2", 10L)).toDF("g", "budget")
    val qe = PrefixSumOps.takeUntilBudget(tok, Seq("g"), "ord", "v", bdf)
      .queryExecution
    assert(qe.analyzed.collectFirst { case h: ResolvedHint => h }.isEmpty,
      "budget join must stay unhinted (AQE decides)")
    // a bare-(g) window is allowed ONLY over the reduced bucket table
    // (child = Aggregate): that's phase 3, ≤ range/width rows per group.
    // Over the full input it would be one reducer per group.
    val bare = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.size < 2 &&
            !w.child.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate] => w
    }
    assert(bare.isEmpty,
      s"single-key window over a non-reduced input (one reducer per group):\n$bare")
  }

  // ---- ppsSystematicSample (dp16's kernel) ----

  /** Brute-force systematic PPS: walk rows in order, keep row i iff its
    * weight interval [C_i, C_i + w_i) contains a mark k·W/budget, i.e.
    * floor((C_i+w_i)·b/W) > floor(C_i·b/W).
    */
  private def brutePps(rows: Seq[(String, Long, Long)], budget: Long): Set[(String, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      val total = rs.map(_._3).sum
      if (total <= 0) Nil
      else {
        var cum = 0L
        rs.sortBy(_._2).flatMap { case (_, ord, w) =>
          val keep = (cum + w) * budget / total > cum * budget / total
          cum += w
          if (keep) Some((g, ord)) else None
        }
      }
    }.toSet

  test("ppsSystematicSample matches the brute-force walk at several budgets") {
    import spark.implicits._
    val rows = tok.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    for (b <- Seq(1L, 7L, 32L, 5000L)) {
      val got = PrefixSumOps.ppsSystematicSample(tok, Seq("g"), "ord", "v", b)
        .select("g", "ord").as[(String, Long)].collect().toSet
      val want = brutePps(rows, b)
      assert(got == want, s"budget=$b diff: ${(got -- want) ++ (want -- got)}")
      // per-group sample size is bounded by the budget
      val sizes = got.groupBy(_._1).map(_._2.size)
      assert(sizes.forall(_ <= b), s"budget=$b exceeded: $sizes")
    }
  }

  test("ppsSystematicSample: sample size is exactly budget when no weight spans a stride") {
    import spark.implicits._
    // equal weights: every stride W/b covers b distinct rows' intervals
    val eq = (0 until 300).map(i => (s"g${i % 3}", i.toLong, 10L)).toDF("g", "ord", "v")
    val out = PrefixSumOps.ppsSystematicSample(eq, Seq("g"), "ord", "v", 20L)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet == Set(20L), s"expected 20 per group: $sizes")
  }

  test("ppsSystematicSample: zero-weight rows are never selected; heavy rows always") {
    import spark.implicits._
    // one row carries 90% of the weight: with budget 10 its interval
    // contains >= 8 marks -> always selected; zero-weight rows never
    val rows = Seq(("g", 0L, 0L), ("g", 1L, 900L), ("g", 2L, 25L),
      ("g", 3L, 0L), ("g", 4L, 75L)).toDF("g", "ord", "v")
    val got = PrefixSumOps.ppsSystematicSample(rows, Seq("g"), "ord", "v", 10L)
      .select("ord").as[Long].collect().toSet
    assert(got.contains(1L), "the dominant-weight row must be in every draw")
    assert(!got.contains(0L) && !got.contains(3L), "zero-weight rows can never straddle a mark")
  }

  test("ppsSystematicSample: all-zero group yields nothing, not a division error") {
    import spark.implicits._
    val rows = Seq(("z", 0L, 0L), ("z", 1L, 0L), ("g", 0L, 5L)).toDF("g", "ord", "v")
    val out = PrefixSumOps.ppsSystematicSample(rows, Seq("g"), "ord", "v", 4L)
      .select("g").as[String].collect().toSet
    assert(out == Set("g"))
  }

  test("ppsSystematicSample plans unhinted (AQE decides the totals join)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val qe = PrefixSumOps.ppsSystematicSample(tok, Seq("g"), "ord", "v", 16L)
      .queryExecution
    assert(qe.analyzed.collectFirst { case h: ResolvedHint => h }.isEmpty)
  }

  // ---- globalRank (dp17's kernel) ----

  test("globalRank equals row_number over the total order, dense and sparse keys") {
    import spark.implicits._
    // sparse composite key: value*R + id with R >> n (range ~ n^2)
    val rows = (0 until 500).map { i =>
      val v = math.abs((i * 2654435761L) % 97)
      (i.toLong, v, v * 100000L + i)
    }.toDF("id", "v", "key")
    val got = PrefixSumOps.globalRank(rows, "key")
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = rows.collect().map(r => (r.getLong(0), r.getLong(2)))
      .sortBy(_._2).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
    // dense key too (the auto-width regime)
    val dense = (0 until 300).map(i => (i.toLong, i.toLong * 3)).toDF("id", "key")
    val gotD = PrefixSumOps.globalRank(dense, "key")
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(gotD == (0 until 300).map(i => i.toLong -> (i + 1L)).toMap)
  }

  test("globalRank sparse-key width keeps the offsets table ~sqrt(n), not ~range") {
    // range ~ n^2: sqrt(range) ~ n would leave ~n offset rows in one
    // phase-3 task; the count-aware width must cap them at ~sqrt(n)
    val n = 400L
    val range = n * n * 100
    val sqrtWidth = PrefixSumOps.bucketWidthFor(range)
    val width = math.max(sqrtWidth,
      math.ceil(range.toDouble / PrefixSumOps.bucketWidthFor(n)).toLong)
    val offsetsBound = range / width + 1
    assert(offsetsBound <= PrefixSumOps.bucketWidthFor(n) + 1,
      s"offsets bound $offsetsBound exceeds ~sqrt(n)=${PrefixSumOps.bucketWidthFor(n)}")
  }

  test("globalRank: empty input yields empty output") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "key")
    assert(PrefixSumOps.globalRank(empty, "key").count() == 0)
  }

  // ---- mixtureInterleave (dp20's kernel) ----

  test("mixtureInterleave: stride schedule matches brute force; rates honored") {
    import spark.implicits._
    // source a: 60 rows weight 3; source b: 20 rows weight 1 — a should
    // appear ~3x as often, evenly, never blocked
    val rows = ((0 until 60).map(i => (i.toLong, "a")) ++
      (0 until 20).map(i => (1000L + i, "b"))).toDF("id", "src")
    val weights = Seq(("a", 3L, 0L), ("b", 1L, 1L)).toDF("src", "w", "src_idx")
    val got = PrefixSumOps.mixtureInterleave(rows, "src", "id", weights)
      .select("id", "src", "src_rank", "vtime", "global_pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length == 80)
    // brute force: vtime = (r-1)*4 div w, order by (vtime, src_idx)
    val want = got.map(g => (g._1, g._2, g._3, (g._3 - 1) * 4 / (if (g._2 == "a") 3 else 1)))
      .sortBy(t => (t._4, t._2)).zipWithIndex
      .map { case ((id, _, _, _), i) => id -> (i + 1L) }.toMap
    assert(got.map(g => g._1 -> g._5).toMap == want)
    // even spread: among any window of global positions 1..k, source a's
    // share tracks 3/4 — check the first 40: expect 30 +- 2 from a
    val firstA = got.filter(_._5 <= 40).count(_._2 == "a")
    assert(math.abs(firstA - 30) <= 2, s"a-share in first 40 was $firstA")
    // vtime computed with W = 3 + 1 = 4
    assert(got.filter(_._2 == "b").sortBy(_._3).map(_._4).take(3).toSeq ==
      Seq(0L, 4L, 8L))
  }

  test("mixtureInterleave: empty input yields empty output") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "src")
    val w = Seq.empty[(String, Long, Long)].toDF("src", "w", "src_idx")
    assert(PrefixSumOps.mixtureInterleave(empty, "src", "id", w).count() == 0)
  }

  test("exclusiveRunningMax matches a brute-force strictly-smaller max at every width") {
    import spark.implicits._
    val rows = Seq((1L, 5L), (3L, 2L), (3L, 9L), (4L, 1L), (10L, 7L), (12L, 7L))
    val df = rows.toDF("o", "v")
    for (width <- Seq(1L, 2L, 3L, 100L)) {
      val got = PrefixSumOps.exclusiveRunningMax(df, Seq(), "o", "v", "pm", width)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(t => (t._1, t._2))
      val want = rows.map { case (o, v) =>
        val prior = rows.filter(_._1 < o).map(_._2)
        (o, v, if (prior.isEmpty) None else Some(prior.max))
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq == want, s"width=$width")
    }
  }

  test("exclusiveRunningMax: ties on the order column do not see each other") {
    import spark.implicits._
    val df = Seq((5L, 100L), (5L, 1L)).toDF("o", "v")
    val got = PrefixSumOps.exclusiveRunningMax(df, Seq(), "o", "v", "pm", 2L)
      .collect().map(r => r.isNullAt(2))
    assert(got.forall(identity), "equal order values must both get NULL")
  }

  test("exclusiveRunningMax respects partition groups") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10L), ("a", 2L, 3L), ("b", 2L, 1L))
      .toDF("g", "o", "v")
    val got = PrefixSumOps.exclusiveRunningMaxAuto(df, Seq("g"), "o", "v", "pm")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(("a", 1L, -1L), ("a", 2L, 10L), ("b", 2L, -1L)))
  }
}
