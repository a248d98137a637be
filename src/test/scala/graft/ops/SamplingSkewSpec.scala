package graft.ops

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.{Caches, Lineage, SparkEntry, SparkSpec}

/** Guards for the de-windowed sampling rankers (round 12):
  *
  * 1. PLAN GUARD — `sample_temperature` must never window-partition
  *    by the language alone (a real crawl is ~half one language: a
  *    lang-keyed ranking window serializes half the corpus into one
  *    unsplittable task), and `batch_by_length` must never
  *    window-partition by the length bucket alone (real corpora
  *    concentrate in 2–4 buckets). Both rankers are REQUIRED to carry
  *    their splitting sub-key (the md5-prefix `bkt`, the doc_id-range
  *    `sb`) in every window partition spec, cuts included — the
  *    bounded-partition shapes of D38/D16.
  *
  * 2. VIRAL PROBES — a one-language corpus (temperature's worst case)
  *    and a one-bucket corpus (every doc the same length class,
  *    batching's worst case) must produce no straggler task AND the
  *    exact answers of the ranking semantics.
  */
class SamplingSkewSpec extends SparkSpec with graft.StragglerProbe {

  private val sfDir = "/root/testdata/sf0.001"

  /** query -> (skewable key, required splitting sub-key) */
  private val guarded = Seq(
    ("sample_temperature", "lang#", "bkt#"),
    ("sample_unimax", "lang#", "bkt#"),
    ("batch_by_length", "bucket#", "sb#"))

  test("no skew-keyed window without its splitting sub-key, cuts included") {
    for ((name, hot, sub) <- guarded) {
      Lineage.planProbe.clear()
      Lineage.probePlans = true
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plans = (s"[final] ${df.queryExecution.executedPlan}" +:
          Lineage.planProbe.asScala.toSeq.map(p => s"[cut] $p"))
        val partSpec = """windowspecdefinition\(([^)]*)""".r
        for (p <- plans; m <- partSpec.findAllMatchIn(p)) {
          val partCols = m.group(1)
            .split(" ASC | DESC |specifiedwindowframe").head
          if (partCols.contains(hot))
            assert(partCols.contains(sub),
              s"$name windows on $hot without $sub — " +
                s"unsplittable viral task ($partCols):\n$p")
        }
      } finally {
        Lineage.probePlans = false
        Lineage.planProbe.clear()
        Caches.sweep(spark)
      }
    }
  }

  /** 1e6 copies of one 11-token page + 2k unique 8-token tail docs,
    * all `lang=en`: ONE language for the temperature ranker and (both
    * texts have ⌊log2(tokens)⌋+1 = 4) ONE length bucket for the
    * batcher — each operator's single-hot-key worst case.
    */
  private def viralDir(): String = {
    val d = Files.createTempDirectory("sampling_viral").toString
    val viral = "click here to accept cookies and continue to the site content"
    val copies = spark.range(1L, 1000001L)
      .select(col("id").as("doc_id"), lit(viral).as("text"))
    val tail = spark.range(1000001L, 1002001L)
      .select(col("id").as("doc_id"), format_string(
        "u%1$da u%1$db u%1$dc u%1$dd u%1$de u%1$df u%1$dg u%1$dh",
        col("id")).as("text"))
    copies.unionByName(tail)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("sample_stratified (registered default) is window-free") {
    // the r13 swap: the bounded TopKAgg form is the registered primary,
    // so the registered plan must carry NO Window node at all — a hot
    // stratum is partial-aggregated, never one giant window task
    val plan = SparkEntry.queries("sample_stratified")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"sample_stratified still plans a Window:\n$plan")
  }

  test("one-stratum corpus: sample_stratified has no straggler, exact k") {
    val d = viralDir() // 1_002_000 docs, ONE language = one stratum
    Sampling.sampleStratifiedBounded(spark, d).limit(1).count() // warm-up
    Caches.sweep(spark)
    var rows: Array[org.apache.spark.sql.Row] = Array.empty
    val times = taskTimes {
      rows = Sampling.sampleStratifiedBounded(spark, d).collect()
    }
    assertNoStraggler(times, "sample_stratified on one-stratum corpus")
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to 20L))
    Caches.sweep(spark)
  }

  test("one-language corpus: sample_temperature has no straggler, exact budget") {
    val d = viralDir()
    Sampling.sampleTemperature(spark, d).limit(1).count() // warm-up
    Caches.sweep(spark)
    var n = 0L
    val times = taskTimes {
      n = Sampling.sampleTemperature(spark, d).count()
    }
    assertNoStraggler(times, "sample_temperature on one-language corpus")
    // one language: k_en = floor(250 * sqrt(n)/sqrt(n)) = the full
    // default budget, and every selected row is that language's
    // smallest-hash prefix — the count is the whole contract here
    assert(n === 250L)
    Caches.sweep(spark)
  }

  test("one-language corpus: sample_unimax has no straggler, exact prefix") {
    val d = viralDir()
    Sampling.sampleUnimax(spark, d).limit(1).count() // warm-up
    Caches.sweep(spark)
    var tok = 0L
    val times = taskTimes {
      tok = Sampling.sampleUnimax(spark, d)
        .agg(sum(col("n_toks"))).collect()(0).getLong(0)
    }
    assertNoStraggler(times, "sample_unimax on one-language corpus")
    // one language absorbs the whole budget (its 1-epoch cap is far
    // above it); the shortest hash prefix reaching 20000 overshoots
    // by at most one doc (the 11-token viral page)
    assert(tok >= 20000L && tok <= 20010L, s"selected tokens $tok")
    Caches.sweep(spark)
  }

  test("one-bucket corpus: batch_by_length has no straggler, exact batch tiling") {
    val d = viralDir()
    Sampling.batchByLength(spark, d).limit(1).count() // warm-up
    Caches.sweep(spark)
    var rows: Array[org.apache.spark.sql.Row] = Array.empty
    val times = taskTimes {
      rows = Sampling.batchByLength(spark, d)
        .agg(sum(col("n_docs")).as("n"),
          countDistinct(col("bucket")).as("buckets"),
          max(col("batch_id")).as("last"),
          sum(when(col("n_docs") === 32, 1).otherwise(0)).as("full"))
        .collect()
    }
    assertNoStraggler(times, "batch_by_length on one-bucket corpus")
    val r = rows.head
    assert(r.getAs[Long]("n") === 1002000L)     // every doc batched once
    assert(r.getAs[Long]("buckets") === 1L)     // genuinely one bucket
    val batches = (1002000L + 31) / 32
    assert(r.getAs[Long]("last") === batches - 1)
    // contiguous tiling: every batch but the ragged tail is full
    assert(r.getAs[Long]("full") === batches - 1)
    Caches.sweep(spark)
  }
}
