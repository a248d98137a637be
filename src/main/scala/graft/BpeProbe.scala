package graft

import org.apache.spark.sql.SparkSession

/** Reproducible merge-count scaling probe for the BPE trainer (SURVEY
  * §8; round-9 verdict item 8): `bpe_encode` trains 20 merges — a toy
  * count. This drives `Bpe.train` at production-shaped merge counts
  * on a real corpus and prints the cost curve, so the documented
  * pattern (ONE (pair, count) driver row per merge, vocabulary-only
  * rewrites) is demonstrated to hold, not assumed.
  *
  * Usage: runMain graft.BpeProbe <sfDir|synth> [mergeCounts…]
  * (default 20 100 500). `synth` builds a rich-vocabulary corpus
  * (5000 docs × 200 words over ~20k distinct 2-8-char shapes) — the
  * sf corpora's synthetic vocabulary exhausts its pair supply after
  * ~107 merges, so demonstrating the 500-merge regime needs word
  * shapes with real character diversity.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDirArg = args.head
    val counts = if (args.length > 1) args.tail.map(_.toInt).toSeq
                 else Seq(20, 100, 500)
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir =
      if (sfDirArg != "synth") sfDirArg
      else {
        import spark.implicits._
        val dir = java.nio.file.Files.createTempDirectory("bpe_synth").toString
        val rng = new scala.util.Random(19)
        // ~20k distinct word shapes over a 26-letter alphabet: enough
        // pair diversity for 500+ learnable merges
        def word(r: scala.util.Random): String =
          Array.fill(2 + r.nextInt(7))(('a' + r.nextInt(26)).toChar).mkString
        val vocab = Array.fill(20000)(word(rng))
        (0 until 5000).map { i =>
          val r = new scala.util.Random(i)
          (i.toLong, Array.fill(200)(vocab(r.nextInt(vocab.length))).mkString(" "))
        }.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
        dir
      }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    for (n <- counts) {
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      val (merges, vocab) = ops.Bpe.train(spark, sfDir, n)
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      val vocabSyms = vocab.selectExpr("sum(size(sym))").head.getLong(0)
      vocab.unpersist()
      println(f"[bpeprobe] merges=$n learned=${merges.size} " +
        f"wall=$wall%.1fs cpu=$cpu%.1fs per_merge=${wall / math.max(1, merges.size)}%.3fs " +
        f"vocab_syms=$vocabSyms")
      Caches.sweep(spark)
    }
    spark.stop()
  }
}
