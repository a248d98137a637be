package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One sketch entry: `count` is a LOWER bound on the token's true
  * frequency (true ≤ count + N/(budget+1), see [[MisraGriesAgg]]).
  */
case class MgEntry(token: String, count: Long)

/** Misra–Gries heavy-hitters sketch as a typed Aggregator — the
  * mergeable-summaries form (Agarwal et al., PODS'12): the buffer
  * holds at most `budget` counters; inserting past the budget (and
  * merging two buffers past it) subtracts the (budget+1)-th largest
  * count from every counter and drops the non-positive ones.
  *
  * Guarantees, independent of partitioning and merge order: with N
  * total tokens, every counter underestimates its token's true
  * frequency by at most N/(budget+1); every token with true frequency
  * > N/(budget+1) survives in the buffer. When `budget` ≥ the number
  * of DISTINCT tokens nothing is ever subtracted and the sketch IS the
  * exact histogram (the property the driver oracle pins; the
  * approximation path is spec-pinned on a forced-overflow corpus).
  *
  * Scale shape: this is the approximate twin of the exact `text_vocab`
  * top-k. The exact version's partial aggregation still shuffles one
  * row per DISTINCT token per partition — at web-corpus vocabulary
  * (1e8+ keys) that shuffle dominates. The sketch shuffles at most
  * `budget` counters per partition into ONE bounded merge, trading the
  * rigid N/(budget+1) error bound for a shuffle independent of
  * vocabulary size.
  */
class MisraGriesAgg(budget: Int)
    extends Aggregator[String, Map[String, Long], Seq[MgEntry]] {
  require(budget >= 1, s"budget must be >= 1, got $budget")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1)
      case None => shrink(buf.updated(tok, 1L))
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    shrink(b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    })

  /** Enforce the budget: subtract the (budget+1)-th largest count from
    * everything and drop the non-positives — the generalized decrement
    * that keeps summaries mergeable (a plain decrement-by-one is the
    * insert-time special case where that count is 1).
    */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= budget) m
    else {
      val cut = m.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(budget)
      m.collect { case (t, c) if c > cut => (t, c - cut) }
    }

  /** Deterministic output order: (count desc, token asc). */
  override def finish(r: Map[String, Long]): Seq[MgEntry] =
    r.toSeq.map { case (t, c) => MgEntry(t, c) }
      .sortBy(e => (-e.count, e.token))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[MgEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MgEntry]]()
}
