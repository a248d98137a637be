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
  * per buffer) the single-buffer formulation is the wrong shape and
  * the BLOCKED covariance ([[GramTileAgg]]: tile the (i, j) plane,
  * one bounded buffer per (i-block, j-block) tile, same merge algebra
  * per tile, tiles packed into envelope-bounded corpus passes)
  * replaces it — [[graft.ops.Pca.covOf]] dispatches automatically.
  * The constructor enforces the envelope rather than letting an
  * executor OOM mid-stage.
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
    // one O(d) copy: the encoder may hand a List, whose apply is O(i) —
    // quadratic indexing turns the O(d²) fill into O(d³)
    val a = x.toArray
    var i = 0
    var idx = 0
    while (i < d) {
      val xi = a(i).toDouble
      b.s(i) += xi
      var j = i
      while (j < d) { b.p(idx) += xi * a(j).toDouble; idx += 1; j += 1 }
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

/** BLOCKED single-pass covariance for d beyond [[GramAgg]]'s
  * single-buffer envelope: the (i, j) upper-triangle plane is tiled
  * into `bs`×`bs` blocks, and ONE aggregator instance carries the
  * buffers of the `tiles` it was assigned — the caller
  * ([[graft.ops.Pca.covOf]]) packs tiles into waves whose combined
  * state fits the same 8·(4096·4097/2 + …) byte envelope the
  * single-buffer form enforces, and runs one corpus pass per wave.
  * That is the classic out-of-core Gram trade: bounded task memory
  * for ⌈tiles/tilesPerWave⌉ passes over a column-pruned scan (at
  * d = 16384, bs = 1024: 136 tiles of 8 MB, 8 per 64 MB wave → 17
  * passes — each pass's exchange is still one buffer per task, never
  * a per-row cell explosion).
  *
  * The merge algebra is [[GramAgg]]'s per tile: `p` concatenates the
  * assigned tiles' product arrays (diagonal tiles store their upper
  * triangle i-major; off-diagonal tiles the full rows×cols block);
  * `s` keeps all d dimension sums (d doubles — negligible next to any
  * tile) so `finish` can center every cell. Cell arithmetic is
  * IDENTICAL to the single-buffer form — same products, same ÷n
  * centering — so at d ≤ 4096 the two formulations agree to the
  * output rounding (spec-pinned).
  */
class GramTileAgg(d: Int, tiles: Seq[(Int, Int)], bs: Int)
    extends Aggregator[Seq[Float], GramBuf, Seq[CovEntry]] {

  require(d > 0 && bs > 0, s"gram_tile_agg: d=$d bs=$bs")
  require(tiles.nonEmpty && tiles.forall { case (bi, bj) =>
    bi <= bj && bi >= 0 && bi.toLong * bs < d && bj.toLong * bs < d
  }, s"gram_tile_agg: bad tiles $tiles for d=$d bs=$bs")

  private def lo(b: Int): Int = b * bs
  private def hi(b: Int): Int = math.min(b * bs + bs, d)

  /** Cells in one tile: diagonal tiles hold their upper triangle. */
  private def tileSize(t: (Int, Int)): Int = {
    val (bi, bj) = t
    val ni = hi(bi) - lo(bi)
    if (bi == bj) ni * (ni + 1) / 2 else ni * (hi(bj) - lo(bj))
  }

  private val offsets: Array[Int] =
    tiles.scanLeft(0)((acc, t) => acc + tileSize(t)).toArray
  private val pd: Int = offsets.last

  require(pd.toLong <= GramTileAgg.EnvelopeCells,
    s"gram_tile_agg: wave of ${tiles.length} tiles = $pd cells exceeds " +
      s"the ${GramTileAgg.EnvelopeCells}-cell task envelope — pack fewer " +
      "tiles per pass")

  override def zero: GramBuf =
    GramBuf(0L, new Array[Double](d), new Array[Double](pd))

  override def reduce(b: GramBuf, x: Seq[Float]): GramBuf = {
    if (x == null || x.length != d) return b
    // one O(d) copy — the GramAgg List-indexing lesson, fatal at this d
    val a = x.toArray
    var i = 0
    while (i < d) { b.s(i) += a(i).toDouble; i += 1 }
    var t = 0
    while (t < tiles.length) {
      val (bi, bj) = tiles(t)
      var idx = offsets(t)
      var ii = lo(bi)
      while (ii < hi(bi)) {
        val xi = a(ii).toDouble
        var jj = if (bi == bj) ii else lo(bj)
        while (jj < hi(bj)) { b.p(idx) += xi * a(jj).toDouble; idx += 1; jj += 1 }
        ii += 1
      }
      t += 1
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
    var t = 0
    while (t < tiles.length) {
      val (bi, bj) = tiles(t)
      var idx = offsets(t)
      var ii = lo(bi)
      while (ii < hi(bi)) {
        var jj = if (bi == bj) ii else lo(bj)
        while (jj < hi(bj)) {
          out(idx) = CovEntry(ii, jj,
            b.p(idx) / n - (b.s(ii) / n) * (b.s(jj) / n))
          idx += 1
          jj += 1
        }
        ii += 1
      }
      t += 1
    }
    out.toSeq
  }

  override def bufferEncoder: Encoder[GramBuf] =
    ExpressionEncoder[GramBuf]()
  override def outputEncoder: Encoder[Seq[CovEntry]] =
    ExpressionEncoder[Seq[CovEntry]]()
}

object GramTileAgg {
  /** Max product cells one task's buffer may hold — the same budget
    * the single-buffer [[GramAgg]] envelope allows at its d = 4096
    * ceiling (4096·4097/2 doubles ≈ 64 MB).
    */
  val EnvelopeCells: Long = 4096L * 4097 / 2
}
