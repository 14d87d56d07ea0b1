package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.extract.Extractors

/** Property-based tests (SURVEY §5 item 4): algebraic laws the operators
  * must satisfy on arbitrary inputs, not just fixtures. Uses raw
  * ScalaCheck generators sampled over fixed seeds (deterministic runs;
  * the scalatest-scalacheck bridge artifact is not in the offline cache).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int = 20): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val codeGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const("false"), Gen.const("FALSE"), Gen.const(""),
    Gen.alphaNumStr.map(s => s"  ${s.take(5)}  "),
    Gen.const("  "))

  test("property: cleaning is idempotent and never emits invalid codes") {
    for (codes <- cases(Gen.listOfN(30, codeGen), 10)) {
      val once = CleanOps.cleanCodes(codes.toDF("code")).as[String].collect().toSeq
      val twice = CleanOps.cleanCodes(once.toDF("code")).as[String].collect().toSeq
      assert(once.sorted == twice.sorted)
      assert(once.forall(c => c != null && c.trim == c && c.nonEmpty
        && !c.equalsIgnoreCase("false")))
    }
  }

  test("property: anti-join result ⊆ left and disjoint from right keys") {
    val keys = Gen.listOfN(25, Gen.choose(0, 12).map(i => s"k$i"))
    for ((left, right) <- cases(Gen.zip(keys, keys), 10)) {
      val out = DedupOps.antiJoinNew(left.toDF("k"), right.toDF("k"), "k")
        .as[String].collect().toSeq
      val leftCounts = left.groupBy(identity).view.mapValues(_.size).toMap
      val outCounts = out.groupBy(identity).view.mapValues(_.size).toMap
      assert(outCounts.forall { case (k, n) => leftCounts.getOrElse(k, 0) >= n })
      assert(out.toSet.intersect(right.toSet).isEmpty)
      // keys not in right survive with multiplicity (no in-batch dedup)
      assert(out.size == left.count(k => !right.contains(k)))
    }
  }

  test("property: union-all row count is additive") {
    val rows = Gen.listOf(Gen.choose(0L, 100L))
    for ((a, b) <- cases(Gen.zip(rows, rows), 10)) {
      assert(a.toDF("x").unionByName(b.toDF("x")).count() == a.size + b.size)
    }
  }

  test("property: whitespace normalization is a fixpoint") {
    val chunk = Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("\t"))
    for (parts <- cases(Gen.listOf(chunk), 20)) {
      val once = Extractors.normWs(parts.mkString)
      assert(Extractors.normWs(once) == once)
      assert(!once.contains("  ") && once == once.trim)
    }
  }

  test("property: session interval fold is order-insensitive and matches sorted gap count") {
    import graft.streaming.StatefulOps.absorb
    val gapUs = 100L
    val tsGen = Gen.listOfN(25, Gen.choose(0L, 2000L))
    for (ts <- cases(tsGen, 20); if ts.nonEmpty) {
      // ground truth: sort, count gaps > gapUs between consecutive events
      val sorted = ts.sorted
      val expected = 1 + sorted.zip(sorted.tail).count { case (a, b) => b - a > gapUs }
      // fold in arbitrary (generated) order, then in reverse, then sorted
      def foldAll(order: Seq[Long]) =
        order.foldLeft(List.empty[(Long, Long)])((acc, t) => absorb(acc, t, gapUs))
      assert(foldAll(ts).size == expected)
      assert(foldAll(ts.reverse).size == expected)
      assert(foldAll(sorted).size == expected)
      // invariant: intervals stay pairwise separated by more than the gap
      val iv = foldAll(ts).sortBy(_._1)
      iv.zip(iv.tail).foreach { case ((_, e1), (s2, _)) => assert(s2 - e1 > gapUs) }
    }
  }

  test("property: KmvAggregator equals sorted-distinct-take-k for any insert order") {
    val agg = new graft.functions.KmvAggregator(8)
    val valsGen = Gen.listOfN(40, Gen.choose(0L, 30L))
    for (vs <- cases(valsGen, 20)) {
      val expected = vs.distinct.sorted.take(8)
      val folded = vs.foldLeft(agg.zero)(agg.reduce)
      assert(folded == expected)
      // merge of arbitrary splits must agree with the straight fold
      val (a, b) = vs.splitAt(vs.length / 3)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expected)
    }
  }

  test("property: jaccard is symmetric, bounded, and 1 on self") {
    import org.apache.spark.sql.functions.col
    val shingleSet = Gen.listOfN(8, Gen.choose(0, 15).map(i => s"s$i")).map(_.distinct)
    val pairs = cases(Gen.zip(shingleSet, shingleSet), 10)
      .filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    assert(pairs.nonEmpty)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      DedupOps.jaccard(col("a"), col("b")).as("ab"),
      DedupOps.jaccard(col("b"), col("a")).as("ba"),
      DedupOps.jaccard(col("a"), col("a")).as("aa"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (ab, ba, aa) =>
      assert(ab == ba && ab >= 0.0 && ab <= 1.0 && aa == 1.0)
    }
  }
}
