package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: a MERGEABLE Misra–Gries heavy-hitter sketch over a string
  * stream — at most `k` (item → counter) entries of aggregation state per
  * partial buffer REGARDLESS of vocabulary size or key skew, with the
  * classic deterministic guarantee: any item whose true frequency exceeds
  * n/(k+1) of the n-item stream is present in the final candidate set
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — both public knowledge).
  *
  * This is the bounded-state alternative to `groupBy(w).count()` for
  * frequency questions that only care about the head: the exact groupBy
  * shuffles the ENTIRE vocabulary (at 100 TB, billions of n-gram keys —
  * the shuffle IS the cost), while this sketch aggregates to ≤ k rows of
  * state per partition and one ≤ k-entry result on the driver. Because
  * the sketch over-approximates (counters are lower bounds, the set can
  * contain false positives but never false negatives above the n/(k+1)
  * line), the production pattern — and q159's — is two passes: sketch to
  * get ≤ k candidates, then ONE candidate-restricted exact count to strip
  * false positives. The output is then exact and deterministic even
  * though WHICH extra sub-threshold candidates the sketch retains depends
  * on partition merge order.
  *
  * reduce: hit → +1; miss with room → insert at 1; miss with k tracked →
  * decrement ALL by one and drop zeros (one shared "charge", the step
  * that buys the bound: each decrement destroys k+1 occurrences' worth of
  * evidence, so it can happen at most n/(k+1) times). merge: pointwise
  * counter sums; if more than k survive, subtract the (k+1)-th largest
  * counter value from all and drop the non-positive (the mergeable-
  * summaries rule — the subtracted value is exactly the smallest amount
  * that restores the k-entry bound, and the per-item error stays ≤
  * combined n/(k+1)).
  *
  * The buffer is a MUTATED HashMap (the Aggregator contract allows it);
  * kryo-encoded only across serialization boundaries, like
  * [[CappedSetAggregator]].
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long],
      w: String): mutable.HashMap[String, Long] = MisraGries.reduce(b, w, k)

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGries.merge(a, b, k)

  override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** [[MisraGriesAggregator]] with the COUNTERS kept in the output — the
  * persisted-ledger form (`IndexStore` `sketch/mg` table): counters are
  * lower bounds (true − n/(k+1) ≤ counter ≤ true), and summaries stored
  * as (w, c) rows merge by pointwise SUM with the error bounds adding —
  * the truncation step is only ever needed to re-bound state size
  * (compaction applies it; a read-side fold keeps every row, which can
  * only widen the candidate superset). */
final class MisraGriesCountsAggregator(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long],
      w: String): mutable.HashMap[String, Long] = MisraGries.reduce(b, w, k)

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGries.merge(a, b, k)

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
    b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

/** The sketch's two rules, shared by both aggregator facades and the
  * store compaction's re-truncation. */
object MisraGries {

  /** hit → +1; miss with room → insert at 1; miss at capacity → one
    * shared decrement (each such step destroys k+1 occurrences' worth of
    * evidence, which is what buys the n/(k+1) bound). */
  def reduce(b: mutable.HashMap[String, Long], w: String,
      k: Int): mutable.HashMap[String, Long] = {
    b.get(w) match {
      case Some(c) => b.update(w, c + 1)
      case None if b.size < k => b.update(w, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.toArray.foreach { key =>
          val c = b(key)
          if (c == 1L) dead += key else b.update(key, c - 1L)
        }
        dead.foreach(b.remove)
    }
    b
  }

  /** Pointwise counter sums, then — only if more than k survive — the
    * mergeable-summaries truncation: subtract the (k+1)-th largest
    * counter from all and drop the non-positive (Agarwal et al. 2012). */
  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long],
      k: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (w, c) => a.update(w, a.getOrElse(w, 0L) + c) }
    truncate(a, k)
  }

  /** The truncation step alone, over any (w, counter) summary. */
  def truncate(a: mutable.HashMap[String, Long],
      k: Int): mutable.HashMap[String, Long] = {
    if (a.size > k) {
      val vs = a.values.toArray.sorted(Ordering[Long].reverse)
      val v = vs(k) // (k+1)-th largest counter
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.toArray.foreach { key =>
        val c = a(key) - v
        if (c <= 0L) dead += key else a.update(key, c)
      }
      dead.foreach(a.remove)
    }
    a
  }
}
