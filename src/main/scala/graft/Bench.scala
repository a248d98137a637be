package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (SURVEY §6): runs the headline query set against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the
  * noop sink (count() would let Catalyst prune the expensive
  * projection work), and prints ONE JSON line.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing", "q3_shipping", "q5_volume", "q_top_users",
    "q_sessionize", "dedup_minhash", "ann_bruteforce", "text_quality",
    "cum_counts",
    // round-5 widening: the operators recent rounds made native or
    // added, previously perf-invisible between rounds
    "dedup_jaccard", "dedup_clusters", "pack_contexts", "ann_ivf",
    "ann_lsh", "dedup_embed",
    // round 6: the reference's CORE workload — PGN parse + running
    // stats + role doubling + range-partitioned monthly sink — timed
    // end to end (20k-game corpus, real parquet write; everything
    // else here is analytics over already-ingested data)
    "pgn_ingest",
    // round 6 (cont.): the cross-doc duplicate-span scan — corpus-wide
    // gram exchange, the heaviest new round-6 analytics operator
    "text_dup_spans",
    // round 6 (cont. 5): the bigram-LM build + scoring joins (the
    // corpus-model train/apply shape), the Bloom-prefiltered
    // incremental dedup (broadcast membership + exact verify), the
    // composed curation gate (every native text scan in one pass +
    // the digest window), and the k-means refinement (row-local
    // assignment + one keyed update + driver centroid roundtrip)
    "text_perplexity", "dedup_incremental_bloom", "curation_gate",
    "embed_kmeans",
    // round 7: SemDeDup — the composed cluster-then-scoped-near-dup
    // pipeline (k-means assignment + cluster-keyed SRP buckets +
    // exact verify), the heaviest new round-7 operator
    "dedup_semantic")

  /** One full ingest pass for the `pgn_ingest` bench entry: 20k
    * sample games through parse → withStats → role doubling → the
    * range-partitioned sink, written to a throwaway dir (a real
    * parquet write — the sink IS part of the measured workload).
    */
  private def ingestOnce(spark: SparkSession): Double = {
    import graft.chess.{ChessPipeline, SamplePgn}
    val src = SamplePgn.ensureWritten(nFiles = 8, gamesPerFile = 2500)
    val out = java.nio.file.Files.createTempDirectory("bench_ingest")
    try {
      val t0 = System.nanoTime()
      ChessPipeline.writePartitioned(
        ChessPipeline.toPlayerGameRole(ChessPipeline.withStats(
          ChessPipeline.parseGames(spark.read.format("pgn").load(src)))),
        out.toString)
      (System.nanoTime() - t0) / 1e9
    } finally
      // don't bloat /tmp across the 4 timed+warm-up runs — including
      // a failed one's partial write
      LocalFs.deleteRecursively(out)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (parquet footer reads, codegen of a trivial
    // plan) so the first measured query doesn't pay session init.
    Tables.names.foreach(n =>
      if (n == "events") Tables.events(spark, sfDir).schema
      else Tables.load(spark, sfDir, n).schema)
    // Noise-robust timing: one untimed warm-up (JIT + janino codegen,
    // which a long-running cluster job pays once, not per-query), then
    // best-of-3 timed runs. This host's wall-clock is noisy (the same
    // query has measured 6.5s-44s under external CPU contention), so a
    // single sample can overstate a query by an order of magnitude; the
    // minimum of three is a far better estimator of the engine's cost.
    // If the three samples still disagree >3x, take up to 2 extra
    // samples. All raw samples are emitted under "runs" for audit.
    //
    // Alongside wall time each sample records PROCESS CPU seconds
    // (sum over the local[N] executor threads): CPU cost is what the
    // engine actually charges and is nearly immune to the external
    // contention that moved identical-code queries ±30% wall round
    // over round (r5→r6) — compare "cpu" across rounds to separate a
    // code regression (cpu moves) from a noisy host (only wall moves).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val results = headline.map { name =>
      try {
        def once(): (Double, Double) =
          // every sample rebuilds its plan from scratch, so the
          // checkpoint blocks it persisted are dead once the sink
          // finishes OR the attempt throws — sweep both paths, or 4
          // samples x N queries of dead blocks accumulate in one JVM
          // (the round-5 clusters drift, generalized to every
          // checkpointing query)
          try {
            val c0 = osBean.getProcessCpuTime
            val wall =
              if (name == "pgn_ingest") ingestOnce(spark)
              else {
                val t0 = System.nanoTime()
                SparkEntry.queries(name)(spark, sfDir)
                  .write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9
              }
            (wall, (osBean.getProcessCpuTime - c0) / 1e9)
          } finally Caches.sweep(spark)
        once() // warm-up, discarded
        var samples = Vector(once(), once(), once())
        var extra = 0
        while (samples.map(_._1).max > 3 * samples.map(_._1).min && extra < 2) {
          samples :+= once(); extra += 1
        }
        (name, samples.minBy(_._1), samples)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          (name, (-1.0, -1.0), Vector.empty[(Double, Double)])
      }
    }
    val qs = results.map { case (k, (w, _), _) => f""""$k":$w%.3f""" }.mkString("{", ",", "}")
    // CPU seconds of the min-wall sample (the sample "value" reports)
    val cpus_ = results.map { case (k, (_, c), _) => f""""$k":$c%.3f""" }.mkString("{", ",", "}")
    val runs = results.map { case (k, _, ss) =>
      s""""$k":${ss.map(s => f"${s._1}%.3f").mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val cpuRuns = results.map { case (k, _, ss) =>
      s""""$k":${ss.map(s => f"${s._2}%.3f").mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"cpu":$cpus_,"runs":$runs,"cpu_runs":$cpuRuns,"sf":"$sfDir"}""")
    spark.stop()
  }
}
