package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values sketch accumulator: the k smallest DISTINCT values of
  * a Long column, as a sorted array.
  *
  * The window formulation of KMV (`row_number() OVER (ORDER BY h)` after
  * a global `distinct()`) shuffles AND sorts every distinct hash of a
  * group inside one reducer — O(distinct) memory and time on a single
  * task per group. This aggregator keeps a k-bounded sorted buffer with
  * map-side combine: each partition reduces to ≤k values before the
  * exchange, so the shuffle carries O(groups × k) rows no matter how
  * many distinct values exist — the KMV shape that survives 100 TB.
  * Duplicates collapse on insert, so no pre-`distinct()` pass is needed
  * either.
  *
  * Register with `functions.udaf(new KmvAggregator(k), Encoders.scalaLong)`
  * to compose with other aggregates in one `agg(...)` (single shuffle).
  */
final class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def insert(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length >= k && buf.last <= h) buf // full and h is no improvement (or dup of last)
    else {
      val i = buf.indexWhere(_ >= h)
      if (i >= 0 && buf(i) == h) buf // distinct: drop duplicates
      else {
        val withNew = if (i < 0) buf :+ h else (buf.take(i) :+ h) ++ buf.drop(i)
        withNew.take(k)
      }
    }

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], a: Long): Seq[Long] = insert(buf, a)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(insert)

  override def finish(reduction: Seq[Long]): Seq[Long] = reduction

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Null-SKIPPING [[KmvAggregator]]: a NULL input contributes nothing —
  * SQL `count(DISTINCT col)` semantics for a nullable hashed column.
  * The primitive-Long variant would silently decode NULL to 0 and
  * insert a spurious hash; a composite aggregation that must see every
  * row (count + null-count + sketch in ONE agg, the q96 streaming
  * profile) cannot pre-filter, so the skip lives in the aggregator.
  */
final class KmvNullableAggregator(k: Int)
    extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  private val inner = new KmvAggregator(k)
  override def zero: Seq[Long] = inner.zero
  override def reduce(buf: Seq[Long], a: java.lang.Long): Seq[Long] =
    if (a == null) buf else inner.reduce(buf, a.longValue)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    inner.merge(b1, b2)
  override def finish(reduction: Seq[Long]): Seq[Long] = reduction
  override def bufferEncoder: Encoder[Seq[Long]] = inner.bufferEncoder
  override def outputEncoder: Encoder[Seq[Long]] = inner.outputEncoder
}
