package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class CappedSetBuf(items: Seq[Long])

/** Typed UDAF: `collect_set` with the accumulation CAPPED at `cap`
  * distinct values — the bounded-state form of the inverted-index
  * df-cap (Dedup.jaccardPairs / q22).
  *
  * The declarative `collect_set` builds the FULL distinct set in the
  * partial buffer and only then hits the `size(ds) <= MaxDf` filter: a
  * stop-shingle ("in the", a license header line) appearing in millions
  * of documents holds millions of ids in aggregation state before being
  * thrown away. This aggregator stops inserting once a buffer reaches
  * `cap` = MaxDf + 1 distinct values: any bucket that hits the cap is
  * already over the df threshold and will be filtered, so losing its
  * tail changes nothing, while buckets at or under MaxDf retain their
  * exact distinct set (bit-identical to sort_array(collect_set)). State
  * is O(cap) per group REGARDLESS of key skew — at 100 TB this is what
  * keeps the one unavoidable corpus shuffle's aggregation memory flat.
  *
  * WHICH ids survive in an over-cap buffer depends on partition merge
  * order (not deterministic) — harmless by construction, since every
  * over-cap bucket is discarded by the df filter.
  */
final class CappedSetAggregator(cap: Int)
    extends Aggregator[Long, CappedSetBuf, Seq[Long]] {

  private def insert(items: Seq[Long], v: Long): Seq[Long] =
    if (items.length >= cap || items.contains(v)) items else items :+ v

  override def zero: CappedSetBuf = CappedSetBuf(Nil)
  override def reduce(b: CappedSetBuf, x: Long): CappedSetBuf =
    CappedSetBuf(insert(b.items, x))
  override def merge(a: CappedSetBuf, b: CappedSetBuf): CappedSetBuf =
    CappedSetBuf(b.items.foldLeft(a.items)(insert))
  override def finish(b: CappedSetBuf): Seq[Long] = b.items.sorted
  override def bufferEncoder: Encoder[CappedSetBuf] = Encoders.product[CappedSetBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
