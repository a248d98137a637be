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
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val baseSf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    val dir = s"/tmp/graft_scale_${n}x$copies"
    big.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    System.err.println(s"[scale] corpus: ${n * copies} docs ($copies x $n) at $dir")

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
    for (name <- Seq("dedup_exact", "dedup_minhash", "dedup_simhash",
        "dedup_jaccard", "dedup_clusters", "contamination", "pack_contexts",
        "text_dup_spans", "text_perplexity")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[scale] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
      Caches.sweep(spark) // each probe measures ITS cost, not leftovers
    }
    spark.stop()
  }
}
