package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Trained-pivot IVF (`annIvf(pivots = "kmeans")`): on a CLUSTERED
  * corpus the k-means‖ centers follow the density, so every cluster
  * lands wholly in one list and recall at fixed nProbe approaches
  * exact — while hash pivots are a membership lottery: clusters that
  * don't own a pivot scatter across whichever foreign lists their
  * members happen to sit nearest, and their neighbors fall outside
  * the probed set. The sf0.01 oracle corpus can't show this (its
  * vectors are near-random, where NO pivot choice beats
  * nProbe/nLists); the planted-cluster corpus here can.
  */
class IvfTrainedSpec extends SparkSpec {

  private val Dim = 24
  private val NClusters = 32
  private val PerCluster = 20
  private val NLists = 16
  private val NProbe = 2

  private def corpus(): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(101)
    val centers = Array.fill(NClusters)(
      Array.fill(Dim)(rng.nextGaussian().toFloat))
    val rows = for (c <- 0 until NClusters; m <- 0 until PerCluster) yield {
      val v = centers(c).map(x => x + 0.2f * rng.nextGaussian().toFloat)
      ((c * PerCluster + m).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def recall(ivf: DataFrame, bf: Set[(Long, Long)]): Double = {
    val got = ivf.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    bf.intersect(got).size.toDouble / bf.size
  }

  test("k-means pivots beat hash pivots on a clustered corpus") {
    val corp = corpus().cache()
    // queries: one member from each of 8 distinct clusters
    val queries = corp.filter(col("vec_id") % (PerCluster * 4) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val bf = Similarity.annBruteforceOn(corp, queries)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // the ivfPivots convention, replicated on this frame: the NLists
    // smallest-md5("ivf:"++id) corpus vectors
    val hashPiv = corp
      .withColumn("hk", md5(concat(lit("ivf:"), col("vec_id").cast("string"))))
      .orderBy("hk", "vec_id").limit(NLists)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val trained = Similarity.trainedPivots(corp, NLists)

    val rHash = recall(Similarity.annIvfOn(corp, queries, hashPiv, NProbe), bf)
    val rKmeans = recall(Similarity.annIvfOn(corp, queries, trained, NProbe), bf)
    info(f"recall@5, nProbe=$NProbe/$NLists: hash $rHash%.3f, kmeans $rKmeans%.3f")
    assert(rKmeans >= 0.95, f"trained-pivot recall $rKmeans%.3f < 0.95")
    assert(rKmeans > rHash,
      f"trained pivots ($rKmeans%.3f) do not beat hash pivots ($rHash%.3f)")
    corp.unpersist()
  }

  test("trained pivots drop in behind the same seam: full probing still exact") {
    val corp = corpus().cache()
    val queries = corp.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val trained = Similarity.trainedPivots(corp, 8)
    // nProbe = nLists scores every vector for every query — the IVF
    // machinery must be a no-op on the result, trained or not
    val full = Similarity.annIvfOn(corp, queries, trained, nProbe = 8)
      .collect().toSeq
    val bf = Similarity.annBruteforceOn(corp, queries).collect().toSeq
    assert(full === bf)
    corp.unpersist()
  }
}
