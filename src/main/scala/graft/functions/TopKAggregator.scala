package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate for top-k selection. */
final case class Scored(id: Long, score: Double)

/** Typed `Aggregator` keeping the k best `Scored` per group, ordered by
  * (score desc, id asc).
  *
  * This is the scale path for per-query top-k (SURVEY §7.1 step 8): a
  * window `row_number <= k` must shuffle and SORT every scored candidate
  * per group, while this aggregates map-side first — each partition
  * reduces its candidates to k before the shuffle, so the exchange
  * carries O(groups x k) rows instead of O(candidates). At 100 TB of
  * candidates that is the difference between a bounded shuffle and an
  * unbounded one.
  *
  * The buffer is a k-bounded sorted Vector (k is small); merge is a
  * bounded merge. Ordering matches the window-based variant exactly, so
  * both produce identical results on identical (rounded) scores.
  */
final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] =
    if (buf.length >= k && better(buf.last, s)) buf
    else {
      val i = buf.indexWhere(x => better(s, x))
      val withNew = if (i < 0) buf :+ s else (buf.take(i) :+ s) ++ buf.drop(i)
      withNew.take(k)
    }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = insert(buf, a)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    b2.foldLeft(b1)(insert)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
