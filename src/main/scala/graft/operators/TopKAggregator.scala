package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Scored row for top-k aggregation. */
case class Scored(id: Long, score: Double)

/** Typed `Aggregator` keeping the k highest-scored rows per group —
  * the UDAF tier of the engine (SURVEY.md §2.11) and the scale-path
  * alternative to `row_number().over(Window)` ranking: the buffer is
  * BOUNDED at k, so partial aggregation trims map-side and the shuffle
  * moves at most k rows per (group, partition) instead of every row.
  * Use when query batches are large or keys skew; the window variant
  * (Similarity.topKPerQuery) is simpler when the batch is small.
  *
  * Ordering: score desc, id asc — identical to topKPerQuery's
  * tie-break, so the two paths agree row-for-row.
  */
class TopKAggregator(k: Int)
  extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  require(k > 0)

  private def ord(s: Scored): (Double, Long) = (-s.score, s.id)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size < k) (b :+ a).sortBy(ord)
    else if (ord(a)._1 < ord(b.last)._1 ||
      (ord(a)._1 == ord(b.last)._1 && ord(a)._2 < ord(b.last)._2))
      (b.init :+ a).sortBy(ord)
    else b

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sortBy(ord).take(k)

  override def finish(b: Seq[Scored]): Seq[Scored] = b

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
