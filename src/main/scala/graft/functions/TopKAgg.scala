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

/** [[Scored]] with a string payload: smaller `negScore` = better, the
  * `key` string breaks ties ascending (lexicographic).
  */
case class ScoredStr(negScore: Double, key: String)

/** [[TopKAgg]] for string-keyed candidates (e.g. top tf-idf terms per
  * document): same bounded O(k) buffer, same partial-aggregation
  * two-stage top-k, ordering by (negScore asc, key asc) — i.e. score
  * desc with lexicographic tie-break, the `row_number() OVER (ORDER BY
  * w DESC, t)` rule without the window.
  */
class TopKStrAgg(k: Int)
    extends Aggregator[ScoredStr, Seq[ScoredStr], Seq[ScoredStr]] {
  private def ord(s: ScoredStr) = (s.negScore, s.key)
  private val lt = Ordering[(Double, String)]

  override def zero: Seq[ScoredStr] = Seq.empty

  override def reduce(buf: Seq[ScoredStr], a: ScoredStr): Seq[ScoredStr] =
    if (buf.size < k) (buf :+ a).sortBy(ord)
    else if (lt.lt(ord(a), ord(buf.last))) (buf.init :+ a).sortBy(ord)
    else buf

  override def merge(b1: Seq[ScoredStr], b2: Seq[ScoredStr]): Seq[ScoredStr] =
    (b1 ++ b2).sortBy(ord).take(k)

  override def finish(r: Seq[ScoredStr]): Seq[ScoredStr] = r.sortBy(ord)

  override def bufferEncoder: Encoder[Seq[ScoredStr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredStr]]()
  override def outputEncoder: Encoder[Seq[ScoredStr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredStr]]()
}
