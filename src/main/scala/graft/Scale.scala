package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (SURVEY §8): builds a dup-heavy corpus N× the size of a
  * base SF's documents table (each copy re-keyed past the originals,
  * so every doc gains N-1 exact dups — the web-crawl shape the
  * exact-dup collapse exists for) and times the dedup family on it.
  * One line per operator; this is the reproducible form of the ad-hoc
  * 50k-doc probes quoted in SURVEY §8.
  *
  *   runMain graft.Scale [baseSf] [copies]
  *   runMain graft.Scale viral [copies]
  *
  * `viral` mode is the adversarial-skew tier (round-11): ONE document
  * with `copies` exact copies (default 1e6) plus a 10k-doc unique
  * tail — the single-hot-digest profile that serializes in a
  * window-based collapse. Per query it also records the STRAGGLER
  * RATIO (max/median task wall) from a task listener, the number the
  * [[graft.ops.Collapse]] seam is graded on.
  */
object Scale {

  /** Task-duration listener: straggler ratio of everything run in
    * `body`. */
  private def withTaskStats(spark: SparkSession)(body: => Unit): (Long, Long) = {
    val times = scala.collection.mutable.ArrayBuffer.empty[Long]
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        times.synchronized { times += t.taskInfo.duration }
    }
    spark.sparkContext.addSparkListener(l)
    try body finally {
      org.apache.spark.sql.GraftSqlShim.flushListeners(spark)
      spark.sparkContext.removeSparkListener(l)
    }
    val sorted = times.synchronized(times.toSeq).sorted
    if (sorted.isEmpty) (0L, 0L)
    else (sorted.last, sorted(sorted.size / 2))
  }

  private def viralCorpus(spark: SparkSession, copies: Int): String = {
    val viral = "click here to accept cookies and continue to the site content"
    val hot = spark.range(1L, copies.toLong + 1)
      .select(col("id").as("doc_id"), lit(viral).as("text"))
    // tail tokens are id-derived so tail docs share NO shingle: the
    // probe isolates exact-dup skew — a templated tail would add 1e8
    // legitimate near-dup candidate pairs (its own, different workload)
    val tail = spark.range(copies.toLong + 1, copies.toLong + 10001)
      .select(col("id").as("doc_id"), format_string(
        "u%1$da u%1$db u%1$dc u%1$dd u%1$de u%1$df u%1$dg u%1$dh",
        col("id")).as("text"))
    val dir = s"/tmp/graft_scale_viral_$copies"
    hot.unionByName(tail)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    System.err.println(
      s"[scale] viral corpus: 1 doc x $copies copies + 10k tail at $dir")
    dir
  }

  def main(args: Array[String]): Unit = {
    val viralMode = args.headOption.contains("viral")
    val baseSf =
      if (viralMode) "" else args.headOption.getOrElse("/root/testdata/sf0.01")
    val copies = args.lift(1).map(_.toInt).getOrElse(if (viralMode) 1000000 else 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = if (viralMode) viralCorpus(spark, copies) else {
      val base = Tables.load(spark, baseSf, "documents")
      val n = base.count()
      // stride by max id, not row count: a sparse-id corpus (previously
      // deduped/subsampled) would otherwise collide copies into each
      // other and silently corrupt the probe (null-guarded for an empty
      // table, where any stride does)
      val maxId = base.agg(max(col("doc_id"))).head()
      val stride = (if (maxId.isNullAt(0)) 0L else maxId.getLong(0)) + 1
      val big = (0 until copies).map(c =>
          base.select((col("doc_id") + lit(c.toLong * stride)).as("doc_id"),
            col("lang"), col("text")))
        .reduce(_.unionByName(_))
      val d = s"/tmp/graft_scale_${n}x$copies"
      big.write.mode("overwrite").parquet(s"$d/documents.parquet")
      System.err.println(s"[scale] corpus: ${n * copies} docs ($copies x $n) at $d")
      d
    }

    // the dedup family (exact-collapse dup-invariance is THE property
    // under test) plus the two round-5 heavies whose bounded-window /
    // broadcast claims deserve measured numbers on the same corpus:
    // contamination broadcasts the test-split shingle set (which GROWS
    // with the corpus here) and pack_contexts exercises the
    // hierarchical offsets at forced fanout depth
    // text_dup_spans shares the family's exact-collapse invariant: its
    // cross-doc gram exchange runs on UNIQUE texts, so doubling the
    // dup factor must not double its cost either
    // text_perplexity joined round 6 (cont. 5): its model counts come
    // from unique texts weighted by multiplicity, so the dup-heavy
    // corpus must grow its cost sublinearly like the dedup family
    val names =
      if (viralMode)
        // the collapse-riding family (SURVEY §4 / Collapse scaladoc):
        // every one of these previously carried the digest-keyed
        // window; the straggler ratio is what the rewrite is graded on
        Seq("dedup_exact", "dedup_minhash", "dedup_simhash",
          "dedup_jaccard", "dedup_clusters", "text_dup_spans",
          "text_perplexity", "curation_gate")
      else
        Seq("dedup_exact", "dedup_minhash", "dedup_simhash",
          "dedup_jaccard", "dedup_clusters", "contamination", "pack_contexts",
          "text_dup_spans", "text_perplexity")
    for (name <- names) {
      val t0 = System.nanoTime()
      val (maxT, medT) = withTaskStats(spark) {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      val ratio = if (medT > 0) maxT.toDouble / medT else 0.0
      System.err.println(f"[scale] $name ${(System.nanoTime() - t0) / 1e9}%.1fs" +
        f" straggler max/median ${maxT}ms/${medT}ms = $ratio%.1fx")
      Caches.sweep(spark) // each probe measures ITS cost, not leftovers
    }
    spark.stop()
  }
}
