package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator for a single-pass second-moment (Gram) sweep over a
  * d-dimensional embedding column: row count, per-dimension sums, and
  * the upper triangle of Σxᵢxⱼ packed i-major (`p(idx(i,j))`,
  * idx = i·d − i(i−1)/2 + (j−i)).
  */
case class GramBuf(n: Long, s: Array[Double], p: Array[Double])

/** One covariance-matrix cell: population covariance of dimensions
  * (i, j), i ≤ j.
  */
case class CovEntry(i: Int, j: Int, cov: Double)

/** Single-pass distributed covariance: a bounded typed Aggregator
  * whose state is O(d²) REGARDLESS of corpus size — the 100 TB shape
  * for PCA/whitening moment collection. Each map task folds its rows
  * into one (n, Σx, ΣxxT-upper) buffer (d(d+1)/2 + d + 1 doubles;
  * 2.1k at d=64), partial aggregation merges one buffer per task, and
  * only buffers ever cross the exchange — never a per-row explosion
  * of d² cells (the naive row·dims² unnest is 2e9 shuffle rows at
  * sf10). `finish` emits the d(d+1)/2 covariance cells
  * `cov(i,j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n)` — the exact arithmetic the
  * DuckDB oracle re-derives (float→double products are exact; the
  * ÷n normalization shrinks sum-order error to ~1e-14, far inside
  * the 6dp output rounding).
  *
  * MEMORY ENVELOPE: per-task state is 8·(d(d+1)/2 + d + 1) bytes —
  * ~17 KB at d=64, ~4 MB at d=1024, ~64 MB at d=4096 — and the merge
  * tree holds a small constant number of buffers per task. That is
  * the documented operating range: up to d≈4096 one buffer fits
  * comfortably in a task's execution memory; beyond it (d=16384 → 1 GB
  * per buffer) the single-buffer formulation is the wrong shape and a
  * BLOCKED covariance (tile (i-block, j-block) cells keyed by block
  * pair — one bounded buffer per tile, same partial-agg algebra per
  * tile) replaces it, per SURVEY §4. The constructor enforces the
  * envelope rather than letting an executor OOM mid-stage.
  *
  * Null or wrong-dimension embeddings are skipped (excluded from n).
  */
class GramAgg(d: Int) extends Aggregator[Seq[Float], GramBuf, Seq[CovEntry]] {

  require(d > 0, s"gram_agg: d=$d")
  require(d <= 4096,
    s"gram_agg: d=$d exceeds the single-buffer envelope (state = " +
      s"8*(d*(d+1)/2 + d + 1) = ${8L * (d.toLong * (d + 1) / 2 + d + 1)} " +
      "bytes/task; > d=4096 needs the blocked-covariance formulation, " +
      "see SURVEY §4)")
  private val pd = d * (d + 1) / 2

  override def zero: GramBuf =
    GramBuf(0L, new Array[Double](d), new Array[Double](pd))

  override def reduce(b: GramBuf, x: Seq[Float]): GramBuf = {
    if (x == null || x.length != d) return b
    var i = 0
    var idx = 0
    while (i < d) {
      val xi = x(i).toDouble
      b.s(i) += xi
      var j = i
      while (j < d) { b.p(idx) += xi * x(j).toDouble; idx += 1; j += 1 }
      i += 1
    }
    b.copy(n = b.n + 1)
  }

  override def merge(b1: GramBuf, b2: GramBuf): GramBuf = {
    var i = 0
    while (i < d) { b1.s(i) += b2.s(i); i += 1 }
    var k = 0
    while (k < pd) { b1.p(k) += b2.p(k); k += 1 }
    b1.copy(n = b1.n + b2.n)
  }

  override def finish(b: GramBuf): Seq[CovEntry] = {
    if (b.n == 0L) return Seq.empty
    val n = b.n.toDouble
    val out = new Array[CovEntry](pd)
    var i = 0
    var idx = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(idx) = CovEntry(i, j, b.p(idx) / n - (b.s(i) / n) * (b.s(j) / n))
        idx += 1
        j += 1
      }
      i += 1
    }
    out.toSeq
  }

  override def bufferEncoder: Encoder[GramBuf] =
    ExpressionEncoder[GramBuf]()
  override def outputEncoder: Encoder[Seq[CovEntry]] =
    ExpressionEncoder[Seq[CovEntry]]()
}
