package graft.ops

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.{Caches, Lineage, SparkEntry, SparkSpec}

/** Guards for the skew-proof exact-dup-collapse seam ([[Collapse]]):
  *
  * 1. PLAN GUARD — none of the collapse-riding queries may contain a
  *    Window node anywhere, INCLUDING inside [[graft.Lineage.cut]]
  *    materializations (a cut hides its upstream plan behind a
  *    LogicalRDD, so the final plan alone proves nothing — the
  *    round-10 window seam lived exactly there). A window partition
  *    cannot be split and AQE skew handling does not apply to
  *    windows, so `min(doc_id) OVER (PARTITION BY digest)` serializes
  *    every copy of a viral document into ONE task; the groupBy +
  *    join-back collapse has partial map-side aggregation and an
  *    AQE-splittable join instead.
  *
  * 2. VIRAL STRAGGLER PROBE — a corpus where ONE document has 1e6
  *    exact copies (the 10⁸-copies-of-a-boilerplate-page crawl
  *    profile, scaled to test size) must not produce a straggler
  *    task, and the collapse must still be semantically exact: every
  *    copy maps to the smallest doc_id.
  */
class CollapseSkewSpec extends SparkSpec with graft.StragglerProbe {

  private val sfDir = "/root/testdata/sf0.001"

  /** The §2 queries whose front-end is the exact-dup collapse —
    * including (round 12) the incremental admission pair, whose
    * within-batch keep-first previously ranked survivors with a
    * tkey-partitioned window (a batch is a whole crawl snapshot at
    * 100 TB; its viral digest serialized into one task) and now runs
    * on the same Collapse seam as the rest of the family. The E9
    * stream routes every micro-batch through the identical shared
    * code (TextStreams.survivors → newAgainstHistory[Bloom]), so
    * these two riders pin the streaming plan too.
    */
  private val riders = Seq("dedup_minhash", "dedup_simhash",
    "dedup_jaccard", "dedup_clusters", "text_dup_spans",
    "text_perplexity", "curation_gate", "text_dsir",
    "text_remove_dup_spans", "text_keywords", "source_overlap",
    "dedup_incremental", "dedup_incremental_bloom",
    // round-12 late riders: the three held-out scorers moved onto the
    // collapse (train counts from unique history texts, batch scored
    // once per unique text)
    "text_perplexity_heldout", "text_dsir_heldout",
    "text_quality_classifier_heldout")

  test("no Window node in any collapse-riding plan, cuts included") {
    for (name <- riders) {
      Lineage.planProbe.clear()
      Lineage.probePlans = true
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plans = (s"[final] ${df.queryExecution.executedPlan}" +:
          Lineage.planProbe.asScala.toSeq.map(p => s"[cut] $p"))
        // Windows PARTITIONED BY a content digest / dup-group / bucket
        // key are the unsplittable-task hazard (partition size = dup
        // multiplicity, unbounded). Windows partitioned by a per-doc
        // key remain legal: their partition is one document's own
        // rows, bounded by content length (e.g. the PPJoin prefix
        // rank over a doc's shingles).
        val forbidden = Seq("tkey#", "setkey#", "rep#", "band#",
          "bhash#", "bucket#", "tbl#")
        val partSpec = """windowspecdefinition\(([^)]*)""".r
        for (p <- plans; m <- partSpec.findAllMatchIn(p)) {
          val partCols = m.group(1)
            .split(" ASC | DESC |specifiedwindowframe").head
          assert(!forbidden.exists(partCols.contains),
            s"$name windows on a dup-group key ($partCols) — " +
              s"unsplittable viral task:\n$p")
        }
      } finally {
        Lineage.probePlans = false
        Lineage.planProbe.clear()
        Caches.sweep(spark)
      }
    }
  }

  test("viral corpus (1e6 copies of one doc): no straggler, exact collapse") {
    val d = Files.createTempDirectory("collapse_viral").toString
    val viral = "click here to accept cookies and continue to the site content"
    // doc_ids 1..1e6 share ONE text; a tail of 2k unique docs keeps the
    // group/unique structure non-degenerate
    val copies = spark.range(1L, 1000001L)
      .select(col("id").as("doc_id"), lit(viral).as("text"))
    // id-derived tail tokens: no cross-tail shingle/simhash overlap,
    // so the probe isolates exact-dup skew (a templated tail is a
    // legitimate near-dup workload, not this test's subject)
    val tail = spark.range(1000001L, 1002001L)
      .select(col("id").as("doc_id"), format_string(
        "u%1$da u%1$db u%1$dc u%1$dd u%1$de u%1$df u%1$dg u%1$dh",
        col("id")).as("text"))
    copies.unionByName(tail)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // warm-up pays one-off codegen; measured run is the second
    Dedup.dedupSimhash(spark, d).limit(1).count()
    Caches.sweep(spark)
    var keeps: Array[org.apache.spark.sql.Row] = Array.empty
    val times = taskTimes {
      keeps = Dedup.dedupSimhash(spark, d)
        .filter(col("doc_id") <= 5 || col("doc_id") === 1000000L).collect()
    }
    assertNoStraggler(times, "dedup_simhash on viral corpus")
    // exactness: every viral copy collapses to doc 1
    assert(keeps.length === 6)
    keeps.foreach(r => assert(r.getAs[Long]("keep_id") === 1L,
      s"copy ${r.getLong(0)} kept ${r.getAs[Long]("keep_id")}, expected 1"))
    Caches.sweep(spark)

    // curation_gate on the same corpus: dup flag correct at both ends
    // (same warm-up convention — its native quality scans JIT on
    // first run, which read as a 4-8 s pseudo-straggler cold)
    TextOps.curationGate(spark, d).limit(1).count()
    Caches.sweep(spark)
    val gate = taskTimes {
      val g = TextOps.curationGate(spark, d)
        .filter(col("doc_id").isin(1L, 2L, 999999L, 1000000L))
        .select("doc_id", "dup").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(g(1L) === false && g(2L) === true && g(999999L) === true)
    }
    assertNoStraggler(gate, "curation_gate on viral corpus")
    Caches.sweep(spark)
  }

  test("viral BATCH (1e6 in-batch copies vs clean history): incremental admission has no straggler") {
    // the incremental profile: the HISTORY (doc_id < 250, the
    // registered splitId) is clean, and the arriving batch carries
    // 1e6 copies of one boilerplate page whose digest history has
    // never seen — so every copy survives the anti-join and the
    // within-batch keep-first alone must absorb the skew (the old
    // tkey window sorted all 1e6 in one task; the Collapse form
    // collapses them map-side)
    val d = Files.createTempDirectory("collapse_viralbatch").toString
    val viral = "subscribe to our newsletter for the latest updates and offers"
    val hist = spark.range(1L, 250L)
      .select(col("id").as("doc_id"), format_string(
        "h%1$da h%1$db h%1$dc h%1$dd h%1$de h%1$df", col("id")).as("text"))
    val copies = spark.range(250L, 1000250L)
      .select(col("id").as("doc_id"), lit(viral).as("text"))
    val tail = spark.range(1000250L, 1002250L)
      .select(col("id").as("doc_id"), format_string(
        "u%1$da u%1$db u%1$dc u%1$dd u%1$de u%1$df u%1$dg u%1$dh",
        col("id")).as("text"))
    hist.unionByName(copies).unionByName(tail)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    for ((name, fn) <- Seq(
        ("dedup_incremental",
          () => Dedup.dedupIncremental(spark, d)),
        ("dedup_incremental_bloom",
          () => Dedup.dedupIncrementalBloom(spark, d)))) {
      fn().limit(1).count() // warm-up pays one-off codegen
      Caches.sweep(spark)
      var kept: Array[Long] = Array.empty
      val times = taskTimes {
        kept = fn().filter(col("doc_id") <= 256 || col("doc_id") >= 1000248L)
          .collect().map(_.getLong(0))
      }
      assertNoStraggler(times, s"$name on viral batch")
      // exactness: of the 1e6 viral copies exactly doc 250 survives;
      // history rows never appear; unique tail rows all survive
      assert(kept.count(id => id >= 250 && id < 1000250) === 1)
      assert(kept.contains(250L))
      assert(!kept.exists(_ < 250))
      assert(Seq(1002248L, 1002249L).forall(kept.contains))
      Caches.sweep(spark)
    }
  }
}
