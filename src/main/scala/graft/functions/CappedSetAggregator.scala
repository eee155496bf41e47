package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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
  *
  * The buffer is a MUTATED ArrayBuffer (the Aggregator contract allows
  * `reduce`/`merge` to modify and return their buffer): object-hash
  * aggregation keeps it as a live object per group, so the per-row cost
  * is one ≤cap linear membership probe and an amortized append — no
  * per-row allocation. Kryo-encoded only when a buffer crosses a
  * serialization boundary (sort-based fallback spill).
  */
final class CappedSetAggregator(cap: Int)
    extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {

  private def insert(items: ArrayBuffer[Long], v: Long): ArrayBuffer[Long] = {
    if (items.length < cap && !items.contains(v)) items += v
    items
  }

  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[Long], x: Long): ArrayBuffer[Long] =
    insert(b, x)
  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] =
    b.foldLeft(a)(insert)
  override def finish(b: ArrayBuffer[Long]): Seq[Long] = b.toSeq.sorted
  override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
    Encoders.kryo[ArrayBuffer[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
