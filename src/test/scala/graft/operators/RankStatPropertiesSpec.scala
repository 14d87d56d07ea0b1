package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Property tests for the two rank-statistic operators (VERDICT r7
  * stretch): [[QuantileOps.histogramThreshold]] against the exact rank
  * statistic across random distributions, bin counts and quantiles; and
  * [[TopKOps.perGroupTopK]] under ADVERSARIAL ties — both what survives
  * when the caller violates the total-order contract (the top-k VALUE
  * multiset is still exact; row identity is not) and that totalizing the
  * order restores exact equality. Same deterministic raw-ScalaCheck
  * style as PropertiesSpec (seeded; no scalatest bridge offline).
  */
class RankStatPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- QuantileOps ----------------------------------------------------

  /** Distribution shapes that stress different histogram failure modes:
    * uniform (every bin hit), skewed (mass in the first bins), clustered
    * (empty bin ranges between spikes), tie-heavy (few distinct values),
    * constant (one bin holds everything).
    */
  private val distGen: Gen[Seq[Double]] = {
    val n = Gen.choose(50, 400)
    Gen.oneOf(
      n.flatMap(Gen.listOfN(_, Gen.choose(0.0, 0.999999))),
      n.flatMap(Gen.listOfN(_, Gen.choose(0.0, 0.999999).map(u => u * u * u * u))),
      n.flatMap(Gen.listOfN(_, Gen.oneOf(0.11, 0.13, 0.52, 0.55, 0.93)
        .flatMap(c => Gen.choose(-0.01, 0.01).map(d => (c + d).max(0.0).min(0.999))))),
      n.flatMap(Gen.listOfN(_, Gen.oneOf(0.125, 0.25, 0.5, 0.75))),
      n.map(Seq.fill(_)(0.42)))
  }
  private val quantGen: Gen[(Int, Int)] =
    Gen.oneOf((1, 2), (9, 10), (99, 100), (1, 100), (3, 7), (1, 1))
  private val binsGen: Gen[Int] = Gen.oneOf(8, 32, 256, 257, 1000)

  test("property: histogram threshold == exact rank statistic's bin, any distribution x bins x quantile") {
    val caseGen = Gen.zip(distGen, binsGen, quantGen)
    for (((values, bins, (num, den)), i) <- cases(caseGen, 25).zipWithIndex) {
      val width = 1.0 / bins
      def binOf(v: Double): Long =
        math.min(math.floor((v - 0.0) / width).toLong, bins - 1L)
      val df = values.map(("g", _)).toDF("g", "v")
      val r = QuantileOps.histogramThreshold(df, Seq("g"), col("v"),
        lo = 0.0, hi = 1.0, bins = bins, num = num, den = den).collect().head
      val sorted = values.sorted
      val n = sorted.size
      val rank = (num.toLong * n + den - 1) / den // ceil(num*n/den)
      val exactBin = binOf(sorted(rank.toInt - 1))
      assert(r.getLong(1) == n, s"case $i: n")
      assert(r.getLong(2) == exactBin,
        s"case $i (bins=$bins q=$num/$den n=$n): thr_bin ${r.getLong(2)} != $exactBin")
      assert(r.getLong(3) == sorted.count(binOf(_) >= exactBin),
        s"case $i (bins=$bins q=$num/$den): n_kept")
    }
  }

  // ---- TopKOps under adversarial ties ---------------------------------

  /** Tie-heavy rows: values from a 4-element set over 2 groups, so at any
    * interesting k the k-th value is tied across many rows and across
    * salt buckets — the exact case where a non-total order lets phase 1
    * and a bare window legitimately pick different rows.
    */
  private val tieRowsGen: Gen[Seq[(String, Long)]] =
    Gen.choose(40, 200).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b"), Gen.oneOf(1L, 2L, 2L, 3L))))

  test("property: with ties and NO totalized order, the top-k VALUE multiset is still exact") {
    val caseGen = Gen.zip(tieRowsGen, Gen.oneOf(1, 4, 32), Gen.choose(1, 15))
    for (((rows, buckets, k), i) <- cases(caseGen, 20).zipWithIndex) {
      val df = rows.zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) }
        .toDF("g", "v", "id")
      // order deliberately NOT total: ties on v are unresolved
      val got = TopKOps.perGroupTopK(df, Seq("g"), Seq(col("v").desc), k,
          saltOn = col("id"), saltBuckets = buckets)
        .select("g", "v", "rank").collect()
        .groupBy(_.getString(0))
      for ((g, grpRows) <- rows.groupBy(_._1)) {
        val expectVals = grpRows.map(_._2).sorted(Ordering[Long].reverse).take(k)
        val gotG = got.getOrElse(g, Array.empty)
        // row IDENTITY is undefined under ties (documented contract), but
        // the returned VALUES must be exactly the k largest, each ranked
        // once in 1..k
        assert(gotG.map(_.getLong(1)).sorted.toSeq == expectVals.sorted,
          s"case $i g=$g k=$k buckets=$buckets: value multiset diverged")
        assert(gotG.map(_.getInt(2)).sorted.toSeq == (1 to gotG.length),
          s"case $i g=$g: ranks not dense")
      }
    }
  }

  // ---- substringSpans -------------------------------------------------

  /** Random docs over a TINY token alphabet (dense shared shingles, runs
    * arising by chance) checked against a brute-force oracle that
    * recomputes the whole contract in plain Scala: positional k-shingles,
    * the stop-shingle rarity filter, diagonal islands, per-pair
    * (n_shared, max_run). Exercises interactions the constructed unit
    * cases can't: shingles repeated WITHIN a doc, multiple diagonals per
    * pair, filter boundaries hit by chance.
    */
  test("property: substringSpans == brute-force positional-shingle runs") {
    val k = 3
    val docGen = Gen.choose(3, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 10).flatMap(n => Gen.listOfN(n, docGen))
    for ((texts, ci) <- cases(corpusGen, 12).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
      val maxDocs = 4; val maxOcc = 10; val minRun = 1
      // brute force
      val shingles = docs.flatMap { case (id, t) =>
        val tk = t.trim.split("\\s+").toSeq
        if (tk.size < k) Nil
        else (0 to tk.size - k).map(i => (id, i + 1, tk.slice(i, i + k).mkString(" ")))
      }
      val byShingle = shingles.groupBy(_._3)
      val keep = byShingle.filter { case (_, occ) =>
        val nd = occ.map(_._1).distinct.size
        nd >= 2 && nd <= maxDocs && occ.size <= maxOcc
      }.keySet
      val m = shingles.filter(s => keep(s._3))
      val matches = for {
        (id1, p1, h1) <- m; (id2, p2, h2) <- m
        if h1 == h2 && id1 < id2
      } yield (id1, id2, p1, p2)
      val expected = matches.groupBy(t => (t._1, t._2)).map { case (pair, ms) =>
        val runs = ms.groupBy(t => t._3 - t._4).values.flatMap { diag =>
          // islands over sorted p1 within one diagonal
          val ps = diag.map(_._3).sorted
          ps.zipWithIndex.groupBy { case (p, i) => p - i }.values.map(_.size)
        }
        (pair._1, pair._2, ms.size.toLong, runs.max.toLong)
      }.filter(_._4 >= minRun).toSet
      val got = DedupOps.substringSpans(docs.toDF("doc_id", "text"),
          "text", "doc_id", k = k, maxDocsPerShingle = maxDocs,
          maxOcc = maxOcc, minRun = minRun)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"case $ci: got ${got.size} pairs, want ${expected.size}")
    }
  }

  test("property: totalizing the order restores exact row-level equality under ties") {
    val caseGen = Gen.zip(tieRowsGen, Gen.oneOf(1, 4, 32), Gen.choose(1, 15))
    for (((rows, buckets, k), i) <- cases(caseGen, 20).zipWithIndex) {
      val df = rows.zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) }
        .toDF("g", "v", "id")
      val order = Seq(col("v").desc, col("id").asc) // unique id => total
      val w = Window.partitionBy("g").orderBy(order: _*)
      val expected = df.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k).select("g", "id", "rank").collect().toSet
      val got = TopKOps.perGroupTopK(df, Seq("g"), order, k,
          saltOn = col("id"), saltBuckets = buckets)
        .select("g", "id", "rank").collect().toSet
      assert(got == expected, s"case $i k=$k buckets=$buckets")
    }
  }
}
