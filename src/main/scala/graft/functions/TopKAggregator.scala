package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A document scored for top-k selection. Ordering: score DESC, then
  * doc_id ASC — a total order, so results are deterministic under ties. */
final case class Scored(doc_id: Long, score: Long)

final case class TopKBuf(items: Seq[Scored])

/** Typed UDAF: bounded top-k per group with O(k) state.
  *
  * The window formulation (row_number over score DESC, filter rk <= k)
  * sorts EVERY row of every group; this aggregator keeps only k items per
  * partial buffer, combines map-side, and never materializes a group's
  * full ordering — at 100 TB that's the difference between a bounded-state
  * partial aggregation and a per-group sort shuffle. Results are identical
  * to the window formulation because the (score DESC, doc_id ASC) order is
  * total.
  */
final class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.doc_id < b.doc_id)

  private def top(items: Seq[Scored]): Seq[Scored] =
    items.sortWith(better).take(k)

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(b: TopKBuf, x: Scored): TopKBuf = TopKBuf(top(b.items :+ x))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = TopKBuf(top(a.items ++ b.items))
  override def finish(b: TopKBuf): Seq[Scored] = top(b.items)
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
