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
  *   runMain graft.Pipeline <sfDir> <outDir> --unimax  (D55 mixture)
  *   runMain graft.Pipeline <sfDir> <outDir> --graph   (graphAudit)
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
      tokenBudget: Long = 10000L, unimax: Boolean = false): Map[String, Long] = {
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
    // Trained/bucketed over the GATED frame (textPplBucketsOn, round
    // 12): the tercile boundaries describe the survivors this stage
    // actually filters — bucketing the whole corpus would shift the
    // cuts by already-dropped docs and remove more or less than a
    // third of the gated set.
    val tail = graft.ops.TextOps.textPplBucketsOn(gated)
      .filter(col("bucket") === "tail").select("doc_id")
    val headMid = gated.join(tail, Seq("doc_id"), "left_anti")
    val nPpl = headMid.count()
    // stage 3: training-mix materialization — default D39 (per-source
    // √-temperature token budgets), or with `unimax` the D55 policy
    // (per-LANGUAGE epoch-capped waterfill; Chung et al. 2023 argue it
    // dominates temperature sampling for multilingual mixes). Both run
    // over the SURVIVORS' own token masses, each group contributing
    // its shortest hash-priority prefix.
    val picked = (
      if (unimax) graft.ops.Sampling.sampleUnimaxOn(
        headMid.select(col("doc_id"), col("lang"), col("text")), tokenBudget)
      else graft.ops.Sampling.sampleMixtureOn(
        headMid.select(col("doc_id"), col("source"), col("text")), tokenBudget))
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

  /** The graph-analytics session: build the n^1.5 [[graft.ops.Similarity.knnGraph]]
    * ONCE (Lineage.cut — the expensive IVF self-join materializes a
    * single time) and feed all five graph riders through their
    * `*On(edges)` seams, instead of paying the build per rider as the
    * self-contained registered keys do (5 riders × the build). Returns
    * the per-rider headline counts; the seam-equality spec pins each
    * On output equal to its registered key.
    */
  def graphAudit(spark: SparkSession, sfDir: String): Map[String, Long] = {
    val nodes = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val labels = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
    val edges = graft.ops.Similarity.knnGraph(spark, sfDir)
      .transform(Lineage.cut) // ONE build feeds all five riders
    // ... and ONE mutual-kNN derivation feeds both mutual-graph riders
    // (r16, guide §1.2): clusters and pagerank previously each re-ran
    // the filter + intersect over the full edge list — identical
    // frames by construction (the public *On seams delegate through
    // the same mutualEdges). Cut so the CC loop and the 10 power
    // iterations both read materialized rows.
    val mutual = graft.ops.Similarity.mutualEdges(edges, 0.3)
      .transform(Lineage.cut)
    try {
      Map(
        "n_edges" -> edges.count(),
        "n_outliers" -> graft.ops.Similarity.knnDensityOn(nodes, edges)
          .filter(col("outlier")).count(),
        "n_misclassified" -> graft.ops.Similarity.knnClassifyOn(edges, labels)
          .filter(!col("correct")).count(),
        "n_clusters" -> graft.ops.Similarity.semanticClustersOnMutual(nodes, mutual)
          .select(col("cluster")).distinct().count(),
        "n_hubs" -> graft.ops.Similarity.knnHubnessOn(nodes, edges)
          .filter(col("hub")).count(),
        "n_ranked" -> graft.ops.Similarity.pageRankOnMutual(nodes, mutual).count())
    } finally {
      Lineage.free(mutual)
      Lineage.free(edges)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // typed-Aggregator plans (TopKAgg and friends) fall back to
      // SORT-BASED aggregation past 128 distinct keys per task by
      // default — the per-task candidate stream then gets fully
      // sorted, the exact cost the O(k)-state aggregators exist to
      // avoid (found by the r13 knnskew probe: the hot Voronoi task
      // sorted 2e8 rows). 128k keys x O(k) state is a few tens of MB.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      // shuffles START wide and let AQE coalesce down (parallelismFirst
      // keeps small exchanges at full parallelism): with the fixed
      // 32-partition default, sf100's 600M-row sort-merge sides ran
      // ~2 GB/partition and spilled — q5_volume measured 194 -> 147 s
      // (-25%) with wide initial partitions. On a real cluster this is
      // the knob that makes one session config survive 100x data drift.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 1024)
      // ...and let AQE coalesce CACHED plans too, or every .cache()
      // materializes all 1024 initial partitions and each downstream
      // pass schedules 1024 mostly-empty tasks (dedup_incremental_bloom
      // warm: 2.6 s wide-initials-only vs 0.7 s with this — the cached
      // history index is tiny but was pinned at the initial width).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // let AQE convert a sort-merge join to broadcast-hash when the
      // RUNTIME build side lands under 64 MB (the default 10 MB left
      // q5_volume's 12.5 MB ASIA-orders side sorting 6M lineitem rows
      // at sf1 - join stage 21.8 -> 3.0 CPU-s with the bump, r16).
      // Runtime sizes are trustworthy where static estimates are not,
      // so ONLY the adaptive threshold moves; the static 10 MB default
      // stays (it guards against estimate-driven giant broadcasts).
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // `--graph`: run the shared-edges graph-analytics session
      // instead of the document chain; `--unimax`: stage 3 uses the
      // D55 per-language waterfill instead of the D39 source mixture
      val rest = args.drop(2).filterNot(a => a == "--graph" || a == "--unimax")
      val counts =
        if (args.contains("--graph")) graphAudit(spark, sfDir)
        else run(spark, sfDir, outDir,
          rest.headOption.map(_.toLong).getOrElse(10000L),
          unimax = args.contains("--unimax"))
      println(counts.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}"))
    } finally {
      Caches.sweep(spark)
      spark.stop()
    }
  }
}
