package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate for top-k selection: smaller `negScore` = better
  * (negated cosine), `id` breaks ties deterministically.
  */
case class Scored(negScore: Double, id: Long)

/** Bounded top-k typed Aggregator: the buffer never holds more than k
  * elements, so per-group state is O(k) regardless of group size —
  * unlike collect_list, which materializes every candidate and is the
  * reason naive per-query top-k needs a salt-and-regroup stage. With a
  * bounded buffer, Spark's partial aggregation IS the two-stage top-k:
  * map-side buffers of k merge pairwise into the final k per key.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def ord(s: Scored) = (s.negScore, s.id)
  private val lt = Ordering[(Double, Long)]

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size < k) (buf :+ a).sortBy(ord)
    else if (lt.lt(ord(a), ord(buf.last))) (buf.init :+ a).sortBy(ord)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sortBy(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r.sortBy(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
