package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Property tests for the two custom join operators, against brute-force
  * oracles computed in plain Scala on random inputs — the correctness
  * arguments ("binning produces no duplicates and misses no pair",
  * "union+window picks exactly the latest right row at or before each
  * left ts") made executable beyond the fixture cases their unit specs
  * pin. Same deterministic raw-ScalaCheck style as PropertiesSpec.
  */
class JoinPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- IntervalJoin ---------------------------------------------------

  /** Random points and intervals over a small value domain (forcing dense
    * overlap), including zero-length intervals, inverted intervals
    * (start > end: must match nothing), negative coordinates (floor-div
    * binning must not break below zero), and bin widths from degenerate
    * (1) to wider than the whole domain.
    */
  test("property: binned interval join == brute-force containment, any data x binWidth") {
    val ptsGen = Gen.choose(10, 80).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50L, 50L)))
    val ivGen = Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(-8L, 25L))
        .map { case (s, span) => (s, s + span) })) // span<0 => inverted
    val caseGen = Gen.zip(ptsGen, ivGen, Gen.oneOf(1L, 3L, 7L, 30L, 1000L))
    for (((pts, ivs, width), i) <- cases(caseGen, 15).zipWithIndex) {
      val points = pts.zipWithIndex.map { case (p, id) => (id.toLong, p) }
        .toDF("pid", "p")
      val intervals = ivs.zipWithIndex.map { case ((s, e), id) => (id.toLong, s, e) }
        .toDF("iid", "s", "e")
      val got = IntervalJoin.pointInInterval(points, intervals, "p", "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val expected = (for {
        (p, pid) <- pts.zipWithIndex
        ((s, e), iid) <- ivs.zipWithIndex
        if p >= s && p <= e
      } yield (pid.toLong, iid.toLong)).sorted
      // exact multiset equality: no missed pair AND no duplicate from
      // multi-bin interval replication
      assert(got == expected, s"case $i width=$width")
    }
  }

  // ---- AsOfJoin -------------------------------------------------------

  /** Random left/right rows over few keys and a small ts domain so ties
    * (right.ts == left.ts), keys with no right rows at all, and multiple
    * left rows per (key, ts) all occur; right rows are deduped to one per
    * (key, ts) per the operator's documented uniqueness contract.
    */
  test("property: asofJoin == brute-force latest-right-at-or-before, ties match") {
    val leftGen = Gen.choose(10, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("k0", "k1", "k2", "lonely"), Gen.choose(0L, 40L))))
    val rightGen = Gen.choose(3, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("k0", "k1", "k2"), Gen.choose(0L, 40L))))
    val caseGen = Gen.zip(leftGen, rightGen)
    for (((lrows, rrowsRaw), i) <- cases(caseGen, 15).zipWithIndex) {
      // uniqueness contract: one right row per (key, ts); payload derived
      // deterministically so the oracle can recompute it
      val rrows = rrowsRaw.distinct
      val left = lrows.zipWithIndex.map { case ((k, ts), id) => (id.toLong, k, ts) }
        .toDF("lid", "k", "ts")
      val right = rrows.map { case (k, ts) => (k, ts, s"$k@$ts") }
        .toDF("k", "ts", "payload")
      val got = AsOfJoin.asofJoin(left, right, "k", "ts", "payload")
        .select("lid", "payload").as[(Long, Option[String])].collect().toMap
      for (((k, ts), id) <- lrows.zipWithIndex) {
        val expected = rrows.filter { case (rk, rts) => rk == k && rts <= ts }
          .sortBy(_._2).lastOption.map { case (rk, rts) => s"$rk@$rts" }
        assert(got(id.toLong) == expected,
          s"case $i left($k, $ts): got ${got(id.toLong)}, want $expected")
      }
      // no row gained or lost: as-of join is left-preserving, 1:1
      assert(got.size == lrows.size)
    }
  }
}
