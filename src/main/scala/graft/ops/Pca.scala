package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** D44: distributed PCA / covariance over the embeddings table — the
  * dimensionality-reduction and whitening stage an embedding-heavy
  * curation pipeline runs before clustering, ANN indexing, or
  * near-dup search (whitened vectors make cosine thresholds
  * comparable across dimensions).
  *
  * Scale design: the entire corpus pass is ONE bounded aggregation —
  * [[graft.functions.GramAgg]] holds O(d²) state per map task and
  * ships one buffer per task across the exchange (2.1k doubles at
  * d = 64), never a per-row unnest of d² cells. The
  * eigendecomposition runs driver-side on the d×d covariance matrix
  * (model-sized — 64×64 here; the documented [[Similarity]]
  * collect-is-model-sized convention), exactly like k-means centroids:
  * moments are distributed, the O(d³) solve is not a data-scale
  * problem. Projection back onto the corpus is a broadcast of the
  * d×p component matrix — a map stage.
  */
object Pca {

  /** Top components reported by [[embedPca]]. */
  private val TopComponents = 8

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.spread(
      Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding")))

  /** Embedding dimensionality probed from one row (driver-side,
    * model-sized).
    */
  private def dimOf(corp: DataFrame): Int =
    corp.select(size(col("embedding")).as("d")).head.getInt(0)

  /** Default block side for the blocked (d > 4096) covariance path. */
  private[ops] val BlockSize = 1024

  /** Tile the upper-triangle (i-block ≤ j-block) plane and pack tiles
    * greedily (in (bi, bj) order) into waves whose combined buffer
    * stays inside [[graft.functions.GramTileAgg.EnvelopeCells]] — each
    * wave is one bounded corpus pass.
    */
  private[ops] def tileWaves(d: Int, bs: Int): Seq[Seq[(Int, Int)]] = {
    val nb = (d + bs - 1) / bs
    def sz(t: (Int, Int)): Long = {
      val ni = math.min(t._1 * bs + bs, d) - t._1 * bs
      val nj = math.min(t._2 * bs + bs, d) - t._2 * bs
      if (t._1 == t._2) ni.toLong * (ni + 1) / 2 else ni.toLong * nj
    }
    val tiles = for (bi <- 0 until nb; bj <- bi until nb) yield (bi, bj)
    val waves = Seq.newBuilder[Seq[(Int, Int)]]
    var cur = Seq.newBuilder[(Int, Int)]
    var used = 0L
    for (t <- tiles) {
      if (used + sz(t) > graft.functions.GramTileAgg.EnvelopeCells && used > 0) {
        waves += cur.result(); cur = Seq.newBuilder; used = 0L
      }
      cur += t; used += sz(t)
    }
    val last = cur.result()
    if (last.nonEmpty) waves += last
    waves.result()
  }

  /** Unrounded covariance cells (i ≤ j, int dims): ONE
    * [[graft.functions.GramAgg]] pass inside the single-buffer
    * envelope (d ≤ 4096); beyond it, the BLOCKED path — tile waves of
    * [[graft.functions.GramTileAgg]] buffers, one envelope-bounded
    * corpus pass per wave over the Lineage-cut scan, unioned (the
    * classic out-of-core Gram trade: task memory stays flat, pass
    * count grows as ⌈tiles/wave⌉).
    */
  private[ops] def covCells(corp: DataFrame, d: Int): DataFrame =
    if (d <= 4096) {
      val g = udaf(new graft.functions.GramAgg(d))
      corp.agg(g(col("embedding")).as("g"))
        .select(explode(col("g")).as("e"))
        .select(col("e.i"), col("e.j"), col("e.cov"))
    } else covCellsBlocked(corp, d, BlockSize)

  /** The blocked path with an explicit block side — the seam the
    * blocked==single equality spec drives at small d.
    */
  private[ops] def covCellsBlocked(corp: DataFrame, d: Int, bs: Int): DataFrame = {
    val waves = tileWaves(d, bs)
    // several passes read the same projection: cache it once
    val src = graft.Lineage.cut(corp.select(col("embedding")))
    waves.map { wv =>
      val g = udaf(new graft.functions.GramTileAgg(d, wv, bs))
      src.agg(g(col("embedding")).as("g"))
        .select(explode(col("g")).as("e"))
        .select(col("e.i"), col("e.j"), col("e.cov"))
    }.reduce(_.unionByName(_))
  }

  /** Population covariance cells (i ≤ j) of `corp`'s embedding column,
    * 6dp-rounded — single-buffer or blocked per [[covCells]].
    */
  private[ops] def covOf(corp: DataFrame, d: Int): DataFrame =
    covCells(corp, d)
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        round(col("cov"), 6).as("cov"))
      .orderBy("i", "j")

  /** D44 (oracled surface): the upper-triangle covariance matrix of
    * the embedding corpus, 6dp-rounded. The DuckDB oracle re-derives
    * every cell from the same `Σxᵢxⱼ/n − mᵢmⱼ` arithmetic (float
    * products are exact in double; the ÷n normalization keeps
    * sum-order error ~1e-14, inside the rounding).
    */
  def embedCov(s: SparkSession, dir: String): DataFrame = {
    val corp = corpus(s, dir)
    covOf(corp, dimOf(corp))
  }

  /** The covariance matrix as a driver-side dense symmetric array
    * (model-sized collect: d(d+1)/2 cells), unrounded.
    */
  private[ops] def covMatrix(corp: DataFrame, d: Int): Array[Array[Double]] = {
    val cells = covCells(corp, d).collect()
    val a = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c
      a(j)(i) = c
    }
    a
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, eigenvectors as ROWS aligned with the values).
    * Deterministic, O(d³) per sweep, converges quadratically — at
    * model size (d ≤ a few hundred) this is microseconds and needs no
    * linear-algebra dependency.
    */
  private[ops] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    // v(c)(r): eigenvector matrix columns; start at identity
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 100 && offDiag() > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s0 = t * c
            // rotate rows/cols p and q of a
            var k = 0
            while (k < d) {
              val akp = a(k)(p)
              val akq = a(k)(q)
              a(k)(p) = c * akp - s0 * akq
              a(k)(q) = s0 * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k)
              val aqk = a(q)(k)
              a(p)(k) = c * apk - s0 * aqk
              a(q)(k) = s0 * apk + c * aqk
              k += 1
            }
            // accumulate the rotation into the eigenvector columns
            k = 0
            while (k < d) {
              val vkp = v(k)(p)
              val vkq = v(k)(q)
              v(k)(p) = c * vkp - s0 * vkq
              v(k)(q) = s0 * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray
    (evals, evecs)
  }

  /** D44 (component surface, rows-only by nature — an
    * eigendecomposition is not ANSI-SQL-expressible): the top
    * principal components' eigenvalues with per-component and
    * cumulative explained-variance fractions. The corpus pass is the
    * same single [[graft.functions.GramAgg]] aggregation as
    * [[embedCov]]; PcaSpec pins the algebra (trace preservation,
    * A·v = λ·v residuals, orthonormality, projected-variance match).
    */
  def embedPca(s: SparkSession, dir: String): DataFrame = {
    val corp = corpus(s, dir)
    val d = dimOf(corp)
    val (evals, _) = jacobiEigen(covMatrix(corp, d))
    val trace = evals.sum
    val top = evals.take(TopComponents)
    val rows = top.zipWithIndex.map { case (ev, i) =>
      (i.toLong, ev, ev / trace, top.take(i + 1).sum / trace)
    }
    import s.implicits._
    rows.toSeq
      .toDF("pc", "eigenvalue", "explained", "cum_explained")
      .select(col("pc"), round(col("eigenvalue"), 6).as("eigenvalue"),
        round(col("explained"), 6).as("explained"),
        round(col("cum_explained"), 6).as("cum_explained"))
      .orderBy("pc")
  }

  /** Projection of `corp` onto driver-trained components (rows of
    * `comps`), mean-centered: out_c = Σᵢ x(i)·comp_c(i) − comp_c·mean.
    * The component matrix and precomputed offsets broadcast as plan
    * literals; the stage is a pure row-local map (HOF dot folds) — no
    * exchange at any corpus size.
    */
  private[ops] def project(corp: DataFrame, comps: Array[Array[Double]],
      mean: Array[Double]): DataFrame = {
    val projCols = comps.zipWithIndex.map { case (comp, c) =>
      val offset = comp.zip(mean).map { case (w, m) => w * m }.sum
      (aggregate(
        zip_with(col("embedding"),
          array(comp.map(w => lit(w)).toSeq: _*),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, t) => acc + t) - lit(offset)).as(s"pc$c")
    }
    corp.select(col("vec_id") +: projCols.toSeq: _*)
  }

  /** Per-dimension means (driver-side, from the same Gram buffer
    * moments — here recomputed via a tiny agg for clarity).
    */
  private[ops] def meanVector(corp: DataFrame, d: Int): Array[Double] = {
    val sums = corp
      .select((0 until d).map(i =>
        sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i")) :+
        count(lit(1)).as("n"): _*)
      .head()
    val n = sums.getLong(d).toDouble
    Array.tabulate(d)(i => sums.getDouble(i) / n)
  }

  val queries: Seq[Q] = Seq(
    // the oracle mirrors the exact cell arithmetic: exact float
    // products, ÷n, mean-product subtraction, 6dp round — sum-order
    // error (~1e-14 after ÷n) is far inside the rounding. `+ 0.0`
    // after the round: a cell in (-5e-7, 0) rounds to -0.0 in DuckDB
    // but +0.0 in Spark (BigDecimal drops the sign) and the canonical
    // float strings differ — the text_dsir convention, exact for
    // every other value
    Q("embed_cov", (s, d) => embedCov(s, d), Some(
      """WITH p AS (
        |  SELECT a.i AS i, b.i AS j
        |  FROM range(64) a(i), range(64) b(i) WHERE a.i <= b.i),
        |s AS (
        |  SELECT p.i, p.j,
        |    sum(e.embedding[p.i + 1]::DOUBLE * e.embedding[p.j + 1]::DOUBLE)
        |      AS sp,
        |    sum(e.embedding[p.i + 1]::DOUBLE) AS si,
        |    sum(e.embedding[p.j + 1]::DOUBLE) AS sj,
        |    count(*) AS n
        |  FROM embeddings e, p GROUP BY p.i, p.j)
        |SELECT i, j, round(sp / n - (si / n) * (sj / n), 6) + 0.0 AS cov
        |FROM s ORDER BY i, j""".stripMargin)),
    Q("embed_pca", (s, d) => embedPca(s, d), None))
}
