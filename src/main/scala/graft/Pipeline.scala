package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline — the user story in one main:
  * curation gate (quality + repetition + language + exact-dup
  * keep-first, all in D25's one pass) → leakage-safe grouped split →
  * partitioned write. Each stage is a library operator the per-stage
  * oracles already pin; this object only CHAINS them, adding no
  * semantics of its own.
  *
  *   runMain graft.Pipeline <sfDir> <outDir>
  *
  * Writes `outDir/corpus` parquet partitioned by `split` and prints
  * one JSON line of per-stage row counts. Scale shape: the gate is a
  * narrow scan + one digest window, the split is a narrow
  * projection, and the sink partitions by split with each split
  * fanned over its natural parallelism — nothing here adds a shuffle
  * beyond the operators' own.
  */
object Pipeline {

  /** Run the chain, returning per-stage counts (and writing the final
    * corpus under `outDir/corpus`, partitioned by split).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String): Map[String, Long] = {
    val docs = Tables.load(spark, sfDir, "documents")
    val total = docs.count()
    // stage 1: quality/language/repetition/dup gate (D25) — keep only
    // passing docs; the gate's flags are oracle-pinned per signal
    val kept = graft.ops.TextOps.curationGate(spark, sfDir)
      .filter(col("keep")).select("doc_id")
    val gated: DataFrame = docs.join(kept, Seq("doc_id"), "left_semi")
    val nGated = gated.count()
    // stage 2: leakage-safe grouped split (D23) — whole sources land
    // in one split, so near-dups inside a source cannot cross
    // train/test
    val split = graft.ops.Sampling.sampleSplitGrouped(spark, sfDir)
      .select(col("doc_id"), col("split"))
    val out = gated.join(split, Seq("doc_id"))
    out.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    val bySplit = spark.read.parquet(s"$outDir/corpus")
      .groupBy("split").count().collect()
      .map(r => s"n_${r.getString(0)}" -> r.getLong(1)).toMap
    Map("n_input" -> total, "n_kept" -> nGated) ++ bySplit
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
      val counts = run(spark, sfDir, outDir)
      println(counts.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}"))
    } finally {
      Caches.sweep(spark)
      spark.stop()
    }
  }
}
