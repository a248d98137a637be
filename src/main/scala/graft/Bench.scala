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
    "dedup_semantic",
    // round 8: BM25 retrieval scoring — the query-term-pruned tf
    // shuffle + broadcast-df + bounded top-k shape
    "text_bm25",
    // round 9: product-quantized ANN (codebook train + code-only ADC
    // join + bounded exact re-rank), the full C4 cleaning pipeline
    // (row-local page rules + the md5-keyed corpus-wide span dedup),
    // and perceptual-hash image near-dup (decode + dHash in the
    // multimodal batch scan, then SimHash banding) — the first
    // multimodal entry in the headline set
    "ann_ivfpq", "text_c4_clean", "dedup_image",
    // round 9 (cont.): the tokenizer-apply workload — the D22 train
    // loop (20 count→argmax→rewrite rounds on the collapsed
    // vocabulary) plus the corpus-wide encode join
    "bpe_encode",
    // round 10: incremental image admission — decode+dHash of the
    // whole corpus, history band-index probe, within-batch collapse
    "dedup_image_incremental",
    // round 11: the corpus-wide kNN graph build (IVF-decomposed
    // self-join, √n lists, bounded top-k) — the substrate of the
    // density/label-propagation/cluster family
    "knn_graph",
    // round 12: the composed graph-family session — ONE cut kNN
    // build feeding density/classify/clusters/pagerank/hubness
    // through the *On seams (Pipeline.graphAudit); tracks the
    // shared-build scaling the riders actually pay in a pipeline
    "graph_audit",
    // round 13: the held-out NB quality scorer — representative of the
    // r12 Collapse re-seamed held-out trio (3 of the 5 heaviest
    // long-tail CPU keys), promoted so the re-seam's scaling is
    // tracked at sf1/sf10 instead of only in the single-sample tail
    "text_quality_classifier_heldout")

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
      // don't bloat /tmp across the timed+warm-up runs — including
      // a failed one's partial write
      LocalFs.deleteRecursively(out)
  }

  /** (wall, processCpu, gcTime) in seconds for one sample. */
  private final case class Sample(wall: Double, cpu: Double, gc: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (parquet footer reads, codegen of a trivial
    // plan) so the first measured query doesn't pay session init.
    Tables.names.foreach(n =>
      if (n == "events") Tables.events(spark, sfDir).schema
      else Tables.load(spark, sfDir, n).schema)
    // Noise-robust timing. This host's wall clock is contended: the
    // round-7 driver bench measured every query 1.2-2.6x slower (and
    // one 13x) than identical code the round before, because external
    // load arrived during ONE query's consecutive samples and left
    // during another's. Three defenses, per the round-7 adjudication:
    //   1. INTERLEAVED sampling — one untimed warm-up pass over all
    //      queries (JIT + janino codegen, paid once on a real
    //      cluster), then 3 ROUND-ROBIN passes (q1..qN, q1..qN, ...)
    //      instead of 3 back-to-back samples per query. A contention
    //      window now inflates every query's sample i roughly
    //      equally, leaving each query's min-of-N from a quieter
    //      pass, instead of destroying all samples of whichever
    //      query it landed on.
    //   2. min-of-N wall per query, with up to 2 extra samples for
    //      queries whose spread is still >3x after the rounds.
    //   3. PROCESS CPU seconds and GC time recorded per sample: CPU
    //      is what the engine actually charges and moves only with
    //      code (compare "cpu" across rounds to separate regression
    //      from noise); GC time exposes heap-pressure drifts that
    //      masquerade as compute regressions (the r5 clusters drift).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    def once(name: String): Sample =
      // every sample rebuilds its plan from scratch, so the
      // checkpoint blocks it persisted are dead once the sink
      // finishes OR the attempt throws — sweep both paths, or N
      // samples x M queries of dead blocks accumulate in one JVM
      // (the round-5 clusters drift, generalized to every
      // checkpointing query)
      try {
        val c0 = osBean.getProcessCpuTime
        val g0 = gcMillis()
        val wall =
          if (name == "pgn_ingest") ingestOnce(spark)
          else if (name == "graph_audit") {
            // the audit's counts ARE its materialization (each rider
            // runs through an action inside graphAudit)
            val t0 = System.nanoTime()
            Pipeline.graphAudit(spark, sfDir)
            (System.nanoTime() - t0) / 1e9
          } else {
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
        Sample(wall, (osBean.getProcessCpuTime - c0) / 1e9,
          (gcMillis() - g0) / 1e3)
      } finally Caches.sweep(spark)

    // huge-SF tiers (sf100) run ONE timed pass with no warm-up — a
    // 2-3 h single pass can't afford 4x, and at that scale per-query
    // JIT noise is a rounding error against multi-minute queries —
    // over an explicit subset (the ladder-relevant heavies + linear
    // controls; a full sf100 headline pass is ~2.5 h alone)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt > 0
    val headline = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(qs) => Bench.headline.filter(qs.split(",").toSet)
      case None => Bench.headline
    }

    val failed = scala.collection.mutable.Set.empty[String]
    // warm-up pass (discarded); a query that throws here is reported
    // as -1 and skipped in the timed rounds
    if (warmup) headline.foreach { name =>
      try once(name)
      catch {
        case e: Throwable =>
          System.err.println(
            s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          failed += name
      }
    }
    val live = headline.filterNot(failed)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Sample]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to rounds; name <- live)
      try {
        val s = once(name)
        samples(name) = samples(name) :+ s
        System.err.println(f"[bench] pass $r: $name ${s.wall}%.1fs cpu ${s.cpu}%.1f")
      } catch {
        case e: Throwable =>
          System.err.println(
            s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
      }
    // queries still noisy after interleaving get up to 2 extra samples
    for (name <- live) {
      var extra = 0
      while (samples(name).nonEmpty &&
          samples(name).map(_.wall).max > 3 * samples(name).map(_.wall).min &&
          extra < 2) {
        try samples(name) = samples(name) :+ once(name)
        catch { case _: Throwable => () }
        extra += 1
      }
    }

    val results: Seq[(String, Sample, Vector[Sample])] = headline.map { name =>
      val ss = samples(name)
      if (ss.isEmpty) (name, Sample(-1.0, -1.0, -1.0), Vector.empty)
      else (name, ss.minBy(_.wall), ss)
    }
    def field(f: Sample => Double): String =
      results.map { case (k, best, _) => f""""$k":${f(best)}%.3f""" }
        .mkString("{", ",", "}")
    def rawField(f: Sample => Double): String =
      results.map { case (k, _, ss) =>
        s""""$k":${ss.map(s => f"${f(s)}%.3f").mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
    val total = results.map(_._2.wall).filter(_ >= 0).sum
    val totalCpu = results.map(_._2.cpu).filter(_ >= 0).sum
    // "order" records the interleave sequence (each timed pass visits
    // queries in exactly this order), so cross-round sample-i
    // alignment is reconstructible from the record alone
    val order = live.map(n => s""""$n"""").mkString("[", ",", "]")
    // --full: one [wall, cpu, gc] sample for EVERY registered query
    // not in the headline set — the long-tail regression radar
    // (round-10 verdict item 6: 79 of 107 keys had no tracked number;
    // a regression in mm_resize or export_shards was invisible).
    // Single-sample wall is noisy on this host — the CPU column is
    // the cross-round comparison signal, same as the headline runs.
    val fullJson = if (!args.contains("--full")) "" else {
      val tail = SparkEntry.queries.keys.toSeq.sorted
        .filterNot(headline.contains)
      val entries = tail.map { name =>
        val s = try once(name) catch {
          case e: Throwable =>
            System.err.println(
              s"[bench] full: $name failed: ${e.getClass.getName}: ${e.getMessage}")
            Sample(-1.0, -1.0, -1.0)
        }
        System.err.println(f"[bench] full: $name ${s.wall}%.2fs cpu ${s.cpu}%.2f")
        f""""$name":[${s.wall}%.3f,${s.cpu}%.3f,${s.gc}%.3f]"""
      }
      s""","full":${entries.mkString("{", ",", "}")}"""
    }
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","cpu_total":$totalCpu%.3f,"queries":${field(_.wall)},"cpu":${field(_.cpu)},"gc":${field(_.gc)},"runs":${rawField(_.wall)},"cpu_runs":${rawField(_.cpu)},"gc_runs":${rawField(_.gc)},"order":$order$fullJson,"sf":"$sfDir"}"""
    // Stdout gets ONLY the compact summary line (metric/value/queries/
    // cpu — the driver contract), ~2 KB. The driver's capture keeps a
    // bounded TAIL of stdout; r13 and r14 both shipped `parsed: null`
    // because the detail line (runs/cpu_runs/gc_runs/--full arrays,
    // tens of KB) had its HEAD cut by that bound. The full detail
    // lives in the durable file below, where it always did.
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","cpu_total":$totalCpu%.3f,"queries":${field(_.wall)},"cpu":${field(_.cpu)},"gc":${field(_.gc)},"sf":"$sfDir"}"""
    println(compact)
    // FINAL stdout line is a minimal record (<120 bytes): the driver
    // keeps only the last 2,000 bytes of stdout, and the compact line
    // above grew past that bound (r13–r15 all shipped `parsed: null`,
    // r15 missing by 89 bytes). The tail now always ends with one
    // complete parseable JSON line regardless of how many queries the
    // headline set grows to; per-query detail stays in the compact
    // line and the durable file.
    val minimal = f"""{"metric":"total","value":$total%.3f,"unit":"sec","cpu_total":$totalCpu%.3f,"sf":"$sfDir"}"""
    println(minimal)
    // Durable twin with the per-sample detail (VERDICT r8 item 7: the
    // driver's BENCH_r08 capture truncated to 6 of 23 queries — the
    // committed file makes the per-query record survive a lossy
    // capture). Path overridable so ad-hoc runs don't clobber the
    // round record.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
