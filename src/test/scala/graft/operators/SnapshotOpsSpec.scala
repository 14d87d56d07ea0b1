package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classifies added / removed / changed / unchanged in one pass") {
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c"))).toDF("k", "v")
    val neu = Seq((2L, Some("b")), (3L, Some("C")), (4L, Some("d"))).toDF("k", "v")
    val got = SnapshotOps.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("k", "status").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("NULL-to-value and value-to-NULL both count as changed") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val neu = Seq((1L, Some("now")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "v")
    val got = SnapshotOps.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("k", "status").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"))
  }

  test("multi-column compare flags a change in any column") {
    val old = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v1", "v2")
    val neu = Seq((1L, "a", 11), (2L, "b", 20)).toDF("k", "v1", "v2")
    val got = SnapshotOps.snapshotDiff(old, neu, Seq("k"), Seq("v1", "v2"))
      .select("k", "status").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged"))
  }
}
