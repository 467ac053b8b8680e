package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score, id) pairs per
  * group, ordered by score descending with id ascending as tie-break.
  *
  * This is the scale-correct form of "top-k per query": a window
  * `row_number` materializes and sorts EVERY scored row per partition
  * before discarding all but k, while an `Aggregator` participates in
  * partial aggregation — each map task reduces its slice to ≤ k pairs
  * before the shuffle, so the exchange carries O(groups × k), not O(rows).
  * Result is identical when scores are pre-rounded (ties broken by id).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      in: (Double, Long)): Seq[(Double, Long)] =
    ((buf :+ in).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}
