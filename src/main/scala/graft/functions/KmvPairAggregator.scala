package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (hash, value) entry of a KMV *sample* sketch. `h` is a uniform
  * hash of the row identity (NOT of the value), `v` the measured value
  * the quantile estimator reads back.
  */
final case class KmvPair(h: Long, v: Double)

/** K-minimum-values SAMPLE sketch: the pairs whose row-identity hashes
  * are the k smallest of the group, sorted ascending by hash.
  *
  * Keeping the k smallest hashes of a uniform row hash IS a uniform
  * random sample of the group (each row's hash is an independent
  * uniform draw; the k minima are an order-statistics sample), and —
  * unlike a reservoir — it is MERGEABLE: the k smallest hashes of a
  * union are computable from the two k-sketches alone, so per-partition
  * (per-day, per-month, per-shard) sketches roll up to any grouping
  * after the fact. That makes this the quantile-sketch complement of
  * [[KmvAggregator]] (distinct counts): same bounded state, same
  * map-side combine, the shuffle carries O(groups × k) rows regardless
  * of group size — the shape that survives 100 TB. `QuantileOps`'
  * histogram thresholds need a KNOWN bounded domain; this sketch does
  * not, at the cost of sampling error O(1/√k).
  *
  * Determinism contract (the property the DuckDB oracle mirrors):
  * entries are distinct by hash, and a hash collision keeps the
  * SMALLEST value, so the result is independent of partitioning and
  * merge order. Register with
  * `functions.udaf(new KmvPairAggregator(k), Encoders.product[KmvPair])`
  * and call with the two columns `(hashCol, valueCol)`.
  */
final class KmvPairAggregator(k: Int)
    extends Aggregator[KmvPair, Seq[KmvPair], Seq[KmvPair]] {

  private def insert(buf: Seq[KmvPair], p: KmvPair): Seq[KmvPair] = {
    val i = buf.indexWhere(_.h >= p.h)
    if (i < 0) { if (buf.length >= k) buf else buf :+ p }
    else if (buf(i).h == p.h) { if (p.v < buf(i).v) buf.updated(i, p) else buf }
    else ((buf.take(i) :+ p) ++ buf.drop(i)).take(k)
  }

  override def zero: Seq[KmvPair] = Vector.empty

  override def reduce(buf: Seq[KmvPair], a: KmvPair): Seq[KmvPair] = insert(buf, a)

  override def merge(b1: Seq[KmvPair], b2: Seq[KmvPair]): Seq[KmvPair] =
    b2.foldLeft(b1)(insert)

  override def finish(reduction: Seq[KmvPair]): Seq[KmvPair] = reduction

  override def bufferEncoder: Encoder[Seq[KmvPair]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KmvPair]]()
  override def outputEncoder: Encoder[Seq[KmvPair]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KmvPair]]()
}
