package graft.ops

import graft.SparkSpec

/** Recall pins for IVF-PQ (D17b) against the exact brute-force
  * answer at sf0.1 (2000 vectors, dim 64, 8 queries) — the D7
  * convention for rows-only ANN operators.
  *
  * Two tiers: full probe coverage (nProbe = nLists) isolates
  * PQ-quantization + re-rank fidelity — the exact top-5 must survive
  * the ADC approximate top-50; the default dials add the IVF
  * membership lottery on top (hash pivots on near-random vectors ≈
  * nProbe/nLists coverage — the geometry D17's spec already pins).
  */
class IvfPqSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.1"

  private def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("full-coverage IVF-PQ recall@5 >= 0.9 vs brute force") {
    val exact = top5(Similarity.annBruteforce(spark, Dir))
    val pq = top5(Similarity.annIvfPq(spark, Dir, nProbe = 16))
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) intersect pq.getOrElse(q, Set.empty)).size.toDouble / exact(q).size)
    val avg = recall.sum / recall.size
    info(f"IVF-PQ full-coverage recall@5 = $avg%.3f")
    assert(avg >= 0.9, f"recall $avg%.3f < 0.9: ${recall.mkString(",")}")
    // a query's own vector must rank first: it survives ADC (its code
    // shares every cell with itself) and exact re-rank puts cos=1 on top
    val selfRank = Similarity.annIvfPq(spark, Dir, nProbe = 16)
      .filter("q_id = vec_id").collect().map(_.getLong(1))
    assert(selfRank.forall(_ == 1L))
  }

  test("ordered-fold codebook update == production avg update on code assignment") {
    // the embed_kmeans convention: the registered (oracle-able)
    // vec_id-ordered mean and the production partial-aggregated avg
    // differ only in last-ulp summation noise — the DISCRETE surface
    // (every vector's m code assignments under the trained books)
    // must be identical at test scale
    import org.apache.spark.sql.functions.col
    val corp = graft.Tables.load(spark, Dir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    try {
      val m = 16; val ds = 64 / m
      val ordered = Similarity.pqCodebooks(corp, m, 16, orderedFold = true)
      val plain = Similarity.pqCodebooks(corp, m, 16, orderedFold = false)
      def codesOf(books: Array[IndexedSeq[(Int, Array[Double])]]) =
        corp.select(col("vec_id"),
            graft.ops.Similarity.pqCodesHof(col("embedding"),
              books, ds).as("c"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(codesOf(ordered) === codesOf(plain))
    } finally corp.unpersist()
  }

  test("default dials: recall degrades only by IVF list coverage, not below it") {
    val exact = top5(Similarity.annBruteforce(spark, Dir))
    val pq = top5(Similarity.annIvfPq(spark, Dir))
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) intersect pq.getOrElse(q, Set.empty)).size.toDouble / exact(q).size)
    val avg = recall.sum / recall.size
    info(f"IVF-PQ default (nProbe 8/16) recall@5 = $avg%.3f")
    // membership-lottery floor: ~nProbe/nLists = 0.5 in expectation on
    // near-random vectors; assert a loose lower bound so a PQ-side
    // regression (not the lottery) fails the spec
    assert(avg >= 0.4, f"recall $avg%.3f below the coverage floor")
  }
}
