package graft.ops

import java.nio.file.Files

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
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
class CollapseSkewSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The §2 queries whose front-end is the exact-dup collapse. */
  private val riders = Seq("dedup_minhash", "dedup_simhash",
    "dedup_jaccard", "dedup_clusters", "text_dup_spans",
    "text_perplexity", "curation_gate", "text_dsir",
    "text_remove_dup_spans", "text_keywords", "source_overlap")

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

  private class TaskTimes extends SparkListener {
    val times: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      synchronized { times += t.taskInfo.duration }
  }

  private def taskTimes(body: => Unit): Seq[Long] = {
    val l = new TaskTimes
    spark.sparkContext.addSparkListener(l)
    try body finally {
      var waited = 0
      var last = -1
      while (waited < 10000 && l.synchronized(l.times.size) != last) {
        last = l.synchronized(l.times.size)
        Thread.sleep(500); waited += 500
      }
      spark.sparkContext.removeSparkListener(l)
    }
    l.times.toSeq
  }

  private def assertNoStraggler(times: Seq[Long], what: String): Unit = {
    assert(times.nonEmpty)
    val sorted = times.sorted
    val median = sorted(sorted.size / 2)
    // same bound as SkewSpec: local-mode floor absorbs JIT/coalesce
    // artifacts; the counterfactual single-task sort of 1e6 viral
    // copies is what the bound exists to catch
    val bound = math.max(10L * median, 5000L)
    assert(sorted.last <= bound,
      s"$what straggler: max task ${sorted.last}ms > bound ${bound}ms " +
        s"(median ${median}ms, ${times.size} tasks)")
    info(f"$what: ${times.size} tasks, median ${median}ms, max ${sorted.last}ms")
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
}
