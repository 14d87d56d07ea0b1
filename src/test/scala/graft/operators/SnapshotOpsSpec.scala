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

  test("scd2: repeats collapse, intervals abut, the current version stays open") {
    import org.apache.spark.sql.functions.timestamp_micros
    // user 1: a a b a  -> versions a[10,30) b[30,40) a[40,NULL)
    // user 2: x        -> one open version
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "a", 40L, 4L), (2L, "x", 15L, 5L))
      .toDF("user_id", "attr", "us", "event_id")
      .withColumn("ts", timestamp_micros($"us"))
    val got = SnapshotOps.scd2(ev, "user_id", "attr", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (1L, 1, "a", 10L, 30L), (1L, 2, "b", 30L, 40L), (1L, 3, "a", 40L, -1L),
      (2L, 1, "x", 15L, -1L)))
  }

  test("scd2: equal timestamps order by the tie column") {
    import org.apache.spark.sql.functions.timestamp_micros
    // two changes at the same microsecond: event_id decides which one
    // opens first and which supersedes it
    val ev = Seq((1L, "p", 10L, 2L), (1L, "q", 10L, 1L))
      .toDF("user_id", "attr", "us", "event_id")
      .withColumn("ts", timestamp_micros($"us"))
    val got = SnapshotOps.scd2(ev, "user_id", "attr", "ts", "event_id")
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((1, "q", 10L, 10L), (2, "p", 10L, -1L)))
  }

  test("applyDiff round-trip: apply(old, diff(old, new)) == new across all four statuses") {
    import spark.implicits._
    // key 1 unchanged, key 2 changed, key 3 removed, key 4 added
    val oldSnap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "bal")
    val newSnap = Seq((1L, "a", 10L), (2L, "b", 99L), (4L, "d", 40L))
      .toDF("k", "name", "bal")
    val diff = SnapshotOps.snapshotDiff(oldSnap, newSnap,
      keys = Seq("k"), compareCols = Seq("name", "bal"))
    val applied = SnapshotOps.applyDiff(oldSnap, diff,
        keys = Seq("k"), compareCols = Seq("name", "bal"))
      .as[(Long, String, Long)].collect().toSet
    assert(applied == Set((1L, "a", 10L), (2L, "b", 99L), (4L, "d", 40L)))
    // and an empty diff is the identity
    val idDiff = SnapshotOps.snapshotDiff(oldSnap, oldSnap,
      keys = Seq("k"), compareCols = Seq("name", "bal"))
    val same = SnapshotOps.applyDiff(oldSnap, idDiff,
        keys = Seq("k"), compareCols = Seq("name", "bal"))
      .as[(Long, String, Long)].collect().toSet
    assert(same == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }
}
