package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.cosine

/** Similarity search over an embedding column (SURVEY §2.D6–D7):
  * brute-force cosine top-k as the exact baseline, and a sign-random-
  * projection (SRP) LSH-bucketed variant with multi-probe as the scale
  * path.
  *
  * Scale design (100 TB corpus, ~1e3 queries):
  *  - the query set is always the broadcast side; the corpus is never
  *    shuffled for candidate generation (scoring is map-side);
  *  - per-query top-k is a TWO-STAGE aggregation: partial top-k per
  *    (query, salt) group, then a final top-k over the ≤ salt×k
  *    survivors. No global sort, no single hot partition per query,
  *    bounded memory per group (collect_list holds ≤ partition-local
  *    candidates; the salt bounds regroup fan-in);
  *  - SRP signatures are deterministic (hyperplane component signs
  *    derive from murmur3(plane, dim)) so results are reproducible
  *    across runs and cluster sizes;
  *  - multi-probe flips each single signature bit ON THE QUERY SIDE
  *    only: the corpus is bucketed once (narrow), queries explode
  *    ×(planes+1) — the small side pays the fan-out.
  */
object Similarity {

  /** SRP bucket id: bit p = sign of dot(vec, r_p), r_p[i] = ±1 by
    * murmur3(p, i) parity. Pure Catalyst HOFs — codegen-friendly,
    * one pass over the vector per plane.
    */
  def srpSignature(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => when((hash(lit(p), i).bitwiseAND(lit(1))) === 1, x).otherwise(-x)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private val K = 5          // neighbors per query
  private val NQueries = 8   // vec_id < NQueries form the query set
  private val Salt = 16      // partial-aggregation fan-out bound

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))

  private def querySet(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Two-stage per-query top-k: (q, salt)-partial then final. Rows
    * come out as (q_id, rank, vec_id, cos).
    */
  private def topKPerQuery(scored: DataFrame): DataFrame = {
    // sort_array ascending on struct(-cos, vec_id): highest cosine
    // first, id as deterministic tie-break.
    def topK(c: Column) = slice(sort_array(c), 1, K)
    val partial = scored
      .withColumn("salt", pmod(col("vec_id"), lit(Salt)))
      .groupBy("q_id", "salt")
      .agg(topK(collect_list(struct((-col("cos")).as("negcos"),
        col("vec_id").as("vec_id")))).as("cand"))
    partial
      .groupBy("q_id")
      .agg(topK(flatten(collect_list(col("cand")))).as("cand"))
      .select(col("q_id"), posexplode(col("cand")).as(Seq("pos", "c")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("c.vec_id").as("vec_id"), (-col("c.negcos")).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** D6: exact brute-force cosine top-k (broadcast query set, map-side
    * scoring, two-stage top-k).
    */
  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val scored = corpus(s, dir)
      .join(broadcast(querySet(s, dir)))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .select("q_id", "vec_id", "cos")
    topKPerQuery(scored)
  }

  private val Planes = 12

  /** D7: SRP-LSH ANN with single-bit multi-probe. The corpus is
    * signed once; each query probes its own bucket plus the `Planes`
    * single-bit-flip buckets, so near-misses across one hyperplane are
    * still found. Only bucket collisions are scored.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = srpSignature(col("embedding"), Planes)
    val corp = corpus(s, dir).withColumn("bucket", sig)
    val probes = querySet(s, dir)
      .withColumn("bucket0", srpSignature(col("q_emb"), Planes))
      .withColumn("bucket", explode(array(
        col("bucket0") +:
          (0 until Planes).map(p => col("bucket0").bitwiseXOR(lit(1L << p))): _*)))
      .select("q_id", "q_emb", "bucket")
    val scored = corp.join(broadcast(probes), "bucket")
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .select("q_id", "vec_id", "cos")
      .dropDuplicates("q_id", "vec_id")
    topKPerQuery(scored)
  }

  val queries: Seq[Q] = Seq(
    Q("ann_bruteforce", annBruteforce, None),
    Q("ann_lsh", annLsh, None)
  )
}
