package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D44 (distributed PCA): hand-computed covariance cells, a known
  * eigensystem, and the corpus-level algebra pins — trace
  * preservation, eigen residuals, orthonormality, and the
  * projected-variance match that validates the whole moments→eigen→
  * project chain end to end.
  */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed covariance cells on a 2-d corpus") {
    val corp = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Pca.covOf(corp, 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // means (2/3, 2/3); E[x²] = 2/3 → var = 2/9; E[xy] = 1/3 → -1/9
    assert(out((0L, 0L)) === 0.222222)
    assert(out((0L, 1L)) === -0.111111)
    assert(out((1L, 1L)) === 0.222222)
  }

  test("rows with null or wrong-dimension embeddings are skipped") {
    val corp = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 1.0f)),
      (4L, null.asInstanceOf[Seq[Float]]),
      (5L, Seq(9.0f))).toDF("vec_id", "embedding")
    val out = Pca.covOf(corp, 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((0L, 0L)) === 0.222222 && out((0L, 1L)) === -0.111111)
  }

  test("GramAgg enforces the single-buffer memory envelope") {
    new graft.functions.GramAgg(4096) // the documented ceiling (64 MB)
    val e = intercept[IllegalArgumentException] {
      new graft.functions.GramAgg(4097)
    }
    assert(e.getMessage.contains("blocked-covariance"))
  }

  test("tile waves: disjoint, complete, every wave inside the task envelope") {
    for ((d, bs) <- Seq((16384, 1024), (5000, 1024), (4100, 1024), (64, 24))) {
      val waves = Pca.tileWaves(d, bs)
      val nb = (d + bs - 1) / bs
      val all = waves.flatten
      assert(all.toSet.size === all.size, s"d=$d: overlapping tiles")
      assert(all.toSet ===
        (for (bi <- 0 until nb; bj <- bi until nb) yield (bi, bj)).toSet,
        s"d=$d: missing tiles")
      def sz(t: (Int, Int)): Long = {
        val ni = math.min(t._1 * bs + bs, d) - t._1 * bs
        val nj = math.min(t._2 * bs + bs, d) - t._2 * bs
        if (t._1 == t._2) ni.toLong * (ni + 1) / 2 else ni.toLong * nj
      }
      for (w <- waves)
        assert(w.map(sz).sum <= graft.functions.GramTileAgg.EnvelopeCells,
          s"d=$d: wave exceeds the envelope")
      // the per-wave bound is also enforced at construction
      assert(waves.forall(w =>
        { new graft.functions.GramTileAgg(d, w, bs); true }))
    }
    // an over-packed wave is rejected at construction, not at OOM
    val tooMany = for (bi <- 0 until 4; bj <- bi until 4) yield (bi, bj)
    val e = intercept[IllegalArgumentException] {
      new graft.functions.GramTileAgg(4096 * 4, tooMany, 4096)
    }
    assert(e.getMessage.contains("envelope"))
  }

  test("blocked covariance == single-buffer covariance at d <= 4096") {
    val corp = graft.Tables.spread(graft.Tables.load(
        spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding")))
    // bs=24 over d=64 → ragged 3×3 block grid incl. off-diagonal tiles
    val blocked = Pca.covCellsBlocked(corp, 64, 24)
      .select(col("i"), col("j"), round(col("cov"), 6).as("cov"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val single = Pca.covOf(corp, 64).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    assert(blocked.keySet === single.keySet)
    for ((k, v) <- single) assert(blocked(k) === v, s"cell $k")
  }

  test("d > 4096: covOf routes to the blocked path and matches direct math") {
    val d = 4100 // two ragged waves at bs=1024 (15 tiles ≈ 8.9M cells)
    val n = 30
    val rnd = new scala.util.Random(42)
    val rows = (0 until n).map(r =>
      (r.toLong, Seq.fill(d)(rnd.nextFloat() * 2f - 1f)))
    val corp = rows.toDF("vec_id", "embedding").coalesce(1)
    assert(Pca.tileWaves(d, Pca.BlockSize).length > 1, "must exercise >1 wave")
    // sample cells: the first rows of the plane + a band crossing the
    // 1024-block boundary (full-plane collect would be 8.4M rows)
    val out = Pca.covOf(corp, d)
      .filter(col("i") < 2 || (col("i") >= 1022 && col("i") <= 1026))
      .collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    val mean = Array.tabulate(d)(i => rows.map(_._2(i).toDouble).sum / n)
    def cov(i: Int, j: Int): Double =
      rows.map(r => r._2(i).toDouble * r._2(j).toDouble).sum / n - mean(i) * mean(j)
    for ((i, j) <- Seq((0, 0), (0, 1), (0, 4099), (1, 1023), (1, 1024),
        (1022, 1023), (1023, 1024), (1024, 2047), (1026, 4099)))
      assert(math.abs(out((i, j)) - cov(i, j)) < 1e-5,
        s"cell ($i,$j): ${out((i, j))} vs ${cov(i, j)}")
    // completeness of the sampled band: each sampled row i has cells
    // for every j in [i, d) — incl. across the 1024-block boundary
    assert(out.keys.count(_._1 == 0) === d)
    assert(out.keys.count(_._1 == 1023) === d - 1023)
    assert(out.keys.count(_._1 == 1024) === d - 1024)
  }

  test("jacobiEigen on a known symmetric system") {
    val (evals, evecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12)
    assert(math.abs(evals(1) - 1.0) < 1e-12)
    // leading eigenvector ∝ (1, 1)/√2 (sign-free check)
    assert(math.abs(math.abs(evecs(0)(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(evecs(0)(0) - evecs(0)(1)) < 1e-12)
  }

  test("corpus algebra: trace, residuals, orthonormality, projection") {
    val dir = "/root/testdata/sf0.001"
    val corp = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val d = 64
    val cov = Pca.covMatrix(corp, d)
    val (evals, evecs) = Pca.jacobiEigen(cov)

    // eigenvalues descending, non-negative (PSD covariance)
    evals.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    assert(evals.forall(_ >= -1e-10))

    // trace preservation: Σλ == Σ var
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(evals.sum - trace) < 1e-9)

    // residuals: ‖A·v − λ·v‖∞ small for the top components
    for (c <- 0 until 8) {
      val v = evecs(c)
      val av = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val res = (0 until d).map(i => math.abs(av(i) - evals(c) * v(i))).max
      assert(res < 1e-9, s"pc$c residual $res")
    }

    // orthonormality of the top components
    for (a <- 0 until 8; b <- a until 8) {
      val dot = (0 until d).map(i => evecs(a)(i) * evecs(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"v${a}.v$b = $dot")
    }

    // end-to-end: variance of the projected corpus along pc_c == λ_c,
    // and distinct projected components are uncorrelated
    val mean = Pca.meanVector(corp, d)
    val proj = Pca.project(corp, evecs.take(2), mean).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val n = proj.length.toDouble
    val (m0, m1) = (proj.map(_._1).sum / n, proj.map(_._2).sum / n)
    val v0 = proj.map(p => (p._1 - m0) * (p._1 - m0)).sum / n
    val v1 = proj.map(p => (p._2 - m1) * (p._2 - m1)).sum / n
    val c01 = proj.map(p => (p._1 - m0) * (p._2 - m1)).sum / n
    assert(math.abs(m0) < 1e-9 && math.abs(m1) < 1e-9) // centered
    assert(math.abs(v0 - evals(0)) < 1e-9, s"var(pc0) $v0 vs ${evals(0)}")
    assert(math.abs(v1 - evals(1)) < 1e-9, s"var(pc1) $v1 vs ${evals(1)}")
    assert(math.abs(c01) < 1e-9, s"cov(pc0, pc1) $c01")
  }

  test("embed_pca surface: 8 rows, explained fractions consistent") {
    val out = Pca.embedPca(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 8)
    assert(out.map(_.getLong(0)).toSeq === (0L to 7L).toSeq)
    val cums = out.map(_.getDouble(3))
    cums.sliding(2).foreach {
      case Array(a, b) => assert(b >= a)
      case _ =>
    }
    assert(cums.last > 0.0 && cums.last <= 1.0)
  }
}
