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
