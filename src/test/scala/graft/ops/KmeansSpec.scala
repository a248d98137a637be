package graft.ops

import graft.SparkSpec

/** Spherical k-means refinement semantics (SURVEY §2.D24) on the
  * driver test embeddings.
  */
class KmeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(iters: Int) =
    Similarity.embedKmeans(spark, dir, iters = iters).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

  test("lloyd refinement: mean assigned-cosine is non-decreasing per step") {
    // cosine is scale-invariant, so the unnormalized-mean update IS
    // the spherical k-means update — each step must not worsen the
    // mean similarity to the assigned centroid (1e-9 float slack)
    val objectives = (0 to 3).map(i => run(i).map(_._3).sum / 500.0)
    objectives.sliding(2).foreach { case Seq(prev, next) =>
      assert(next >= prev - 1e-9, s"objective regressed: $objectives")
    }
    // and refinement actually moves: one step must beat the raw
    // pivot assignment strictly (pivots are arbitrary hash picks)
    assert(objectives(1) > objectives(0), s"no refinement: $objectives")
  }

  test("production plain-mean update assigns identically to the ordered fold") {
    // the partial-aggregated mean (order-free float sum — what a
    // 100 TB update uses) differs from the oracle-able ordered fold
    // only in last-ulp noise; cluster assignment must not flip
    val ordered = Similarity.embedKmeans(spark, dir, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val plain = Similarity.embedKmeans(spark, dir, iters = 2,
      orderedFold = false)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(plain.toSeq === ordered.toSeq)
  }

  test("assignment is deterministic, total, and non-trivial") {
    val a = run(1)
    val b = run(1)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 500)
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    assert(a.map(_._2).distinct.length > 1, "all vectors in one cluster")
    assert(a.forall(r => r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9))
  }

  test("sorted=false returns the same assignment without the global sort") {
    val sorted = Similarity.embedKmeans(spark, dir, iters = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val unsorted = Similarity.embedKmeans(spark, dir, iters = 1,
      sorted = false)
    assert(!unsorted.queryExecution.executedPlan.toString.contains("Sort "),
      "production path still global-sorts the assignment")
    assert(unsorted.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      === sorted)
  }

  /** A corpus where init quality is visible: `k` well-separated
    * direction prototypes, points = prototype + small deterministic
    * per-dim jitter. Hash init picks k arbitrary points (often two
    * from one true cluster and none from another); k-means|| samples
    * by cost, so it must land at-least-as-good after equal Lloyd
    * refinement.
    */
  test("k-means|| init: objective >= hash init on a clustered corpus") {
    import spark.implicits._
    val d = 16
    val kTrue = 6
    val rows = for {
      c <- 0 until kTrue
      j <- 0 until 60
    } yield {
      val base = Array.tabulate(d)(i =>
        if (i % kTrue == c) 4.0f else 0.0f)
      val jitter = Array.tabulate(d)(i =>
        (((c * 1009 + j * 131 + i * 17) % 29) - 14) / 60.0f)
      (c * 60L + j, base.zip(jitter).map { case (a, b) => a + b }.toSeq)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    def objective(init: String): Double =
      Similarity.embedKmeansOn(vecs, k = kTrue, iters = 2, init = init)
        .collect().map(_.getDouble(2)).sum / rows.length
    val hash = objective("hash")
    val par = objective("parallel")
    assert(par >= hash - 1e-9, s"k-means|| ($par) worse than hash ($hash)")
    // and on THIS corpus the cost-aware init strictly separates:
    // every true cluster gets its own centroid direction
    assert(par > 0.95, s"k-means|| objective too low: $par")
  }
}
