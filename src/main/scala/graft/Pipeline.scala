package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline — the user story in one main:
  * curation gate (quality + repetition + language + exact-dup
  * keep-first, all in D25's one pass) → CCNet perplexity-tercile
  * filter (D47 — drop the confidently-"tail" third per language) →
  * token-budget mixture materialization (D39 — √-temperature source
  * weights over the survivors' own token masses) → leakage-safe
  * grouped split → partitioned write. Each stage is a library
  * operator the per-stage oracles already pin; this object only
  * CHAINS them, adding no semantics of its own. (Order matters and
  * is the canonical one: dedup/gate rules BEFORE model-based
  * scoring, scoring before mixture assembly, the split last so its
  * proportions describe what actually ships.)
  *
  *   runMain graft.Pipeline <sfDir> <outDir> [tokenBudget]
  *
  * Writes `outDir/corpus` parquet partitioned by `split` and prints
  * one JSON line of per-stage row counts. Scale shape: the gate is a
  * narrow scan + the skew-proof collapse, the perplexity filter and
  * the mixture add only their operators' own documented exchanges,
  * the split is a narrow projection, and the sink partitions by
  * split with each split fanned over its natural parallelism.
  */
object Pipeline {

  /** Run the chain, returning per-stage counts (and writing the final
    * corpus under `outDir/corpus`, partitioned by split).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      tokenBudget: Long = 10000L): Map[String, Long] = {
    val docs = Tables.load(spark, sfDir, "documents")
    val total = docs.count()
    // stage 1: quality/language/repetition/dup gate (D25) — keep only
    // passing docs; the gate's flags are oracle-pinned per signal
    val kept = graft.ops.TextOps.curationGate(spark, sfDir)
      .filter(col("keep")).select("doc_id")
    val gated: DataFrame = docs.join(kept, Seq("doc_id"), "left_semi")
    val nGated = gated.count()
    // stage 2: CCNet §3.3 — drop each language's highest-perplexity
    // tercile (D47). Docs the LM cannot score (no bigram) pass
    // through: the filter only demotes confidently-tail documents.
    val tail = graft.ops.TextOps.textPplBuckets(spark, sfDir)
      .filter(col("bucket") === "tail").select("doc_id")
    val headMid = gated.join(tail, Seq("doc_id"), "left_anti")
    val nPpl = headMid.count()
    // stage 3: training-mix materialization (D39) — per-source token
    // budgets b_s ∝ √T_s over the SURVIVORS' token masses, each
    // source contributing its shortest hash-priority prefix
    val picked = graft.ops.Sampling.sampleMixtureOn(
        headMid.select(col("doc_id"), col("source"), col("text")),
        tokenBudget)
      .select("doc_id")
    val mixed = headMid.join(picked, Seq("doc_id"), "left_semi")
    val nMixed = mixed.count()
    // stage 4: leakage-safe grouped split (D23) — whole sources land
    // in one split, so near-dups inside a source cannot cross
    // train/test
    val split = graft.ops.Sampling.sampleSplitGrouped(spark, sfDir)
      .select(col("doc_id"), col("split"))
    val out = mixed.join(split, Seq("doc_id"))
    out.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    val bySplit = spark.read.parquet(s"$outDir/corpus")
      .groupBy("split").count().collect()
      .map(r => s"n_${r.getString(0)}" -> r.getLong(1)).toMap
    Map("n_input" -> total, "n_kept" -> nGated,
      "n_ppl_kept" -> nPpl, "n_mixture" -> nMixed) ++ bySplit
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val budget = args.drop(2).headOption.map(_.toLong).getOrElse(10000L)
      val counts = run(spark, sfDir, outDir, budget)
      println(counts.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}"))
    } finally {
      Caches.sweep(spark)
      spark.stop()
    }
  }
}
