package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** E10: continuous C4 cleaning against the persistent span index —
  * a span repeated ACROSS batches must be dropped on its second
  * arrival via the index, in-batch repeats keep their first
  * occurrence, a replayed batch is a no-op, the admitted output must
  * come from the same `cleanCore` rule the batch oracle pins, and
  * doc_id-ordered arrival reproduces the BATCH full cleaner exactly.
  */
class C4CleanStreamSpec extends SparkSpec {

  // pages of ≥3 kept sentences; the repeated three-sentence block is
  // the planted cross-page span
  private val boiler = Seq(
    "share this page now please.",
    "follow us on social media today.",
    "all rights reserved by this site.")
  private def page(own: Seq[String], withBoiler: Boolean): String =
    ((if (withBoiler) boiler else Nil) ++ own).mkString("\n")

  private val ownA = Seq("alpha beta gamma one.", "delta epsilon zeta two.",
    "eta theta iota three.")
  private val ownB = Seq("kappa lambda mu four.", "nu xi omicron five.",
    "pi rho sigma six.")
  private val ownC = Seq("tau upsilon phi seven.", "chi psi omega eight.",
    "alef bet gimel nine.")

  private def publish(srcDir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("c4s_pub").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.iterator().asScala.toSeq)
      .find(_.getFileName.toString.endsWith(".parquet"))
    assert(part.isDefined, "no part file produced")
    Files.move(part.get, Paths.get(srcDir, name))
  }

  private def outRows(out: String): Map[Long, (Long, String)] =
    spark.read.parquet(out)
      .select("doc_id", "n_dropped", "final_text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("cross-batch span dropped via the index; in-batch first occurrence kept; replay no-op") {
    val src = Files.createTempDirectory("c4s_src").toString
    val out = Files.createTempDirectory("c4s_out").toString
    val idx = Files.createTempDirectory("c4s_idx").toString
    val ckpt = Files.createTempDirectory("c4s_ckpt").toString

    // batch 0: doc 1 carries the boilerplate block + own sentences;
    // doc 2 clean. The boilerplate spans are now "seen".
    val b0 = Seq(1L -> page(ownA, withBoiler = true),
      2L -> page(ownB, withBoiler = false))
    publish(src, "b0.parquet", b0)
    val q = TextStreams.c4CleanStream(spark, src, out, idx, ckpt)
    try {
      q.processAllAvailable()
      val r0 = outRows(out)
      assert(r0(1L)._1 === 0L, "first-seen spans keep their sentences")
      assert(r0(2L)._1 === 0L)
      // batch 1: doc 3 repeats the boilerplate block (cross-batch →
      // dropped via the index); docs 4/5 repeat a fresh in-batch
      // block — 4 (smaller doc_id) keeps it, 5 drops it
      val block = Seq("brand new repeated block one.",
        "brand new repeated block two.", "brand new repeated block three.")
      val b1 = Seq(3L -> page(ownC, withBoiler = true),
        4L -> (block ++ ownA.map(_.replace("one", "ten"))).mkString("\n"),
        5L -> (block ++ ownB.map(_.replace("four", "eleven"))).mkString("\n"))
      publish(src, "b1.parquet", b1)
      q.processAllAvailable()
      val r1 = outRows(out)
      assert(r1(3L)._1 === 3L, "cross-batch boilerplate must drop via the index")
      assert(!r1(3L)._2.contains("share this page"),
        "boilerplate sentences must be gone from the rebuilt page")
      assert(r1(3L)._2.contains("tau upsilon phi seven."),
        "own sentences survive")
      assert(r1(4L)._1 === 0L, "first in-batch occurrence keeps the block")
      assert(r1(5L)._1 === 3L, "second in-batch occurrence drops it")
    } finally q.stop()

    // replay committed batch 1: dynamic overwrite + own-batch history
    // exclusion make it a no-op on output AND index
    import spark.implicits._
    val block = Seq("brand new repeated block one.",
      "brand new repeated block two.", "brand new repeated block three.")
    val replay = Seq(3L -> page(ownC, withBoiler = true),
      4L -> (block ++ ownA.map(_.replace("one", "ten"))).mkString("\n"),
      5L -> (block ++ ownB.map(_.replace("four", "eleven"))).mkString("\n"))
      .toDF("doc_id", "text")
    val idxBefore = spark.read.parquet(idx).count()
    TextStreams.c4ApplyBatch(spark, replay, batchId = 1L, out, idx)
    assert(outRows(out)(3L)._1 === 3L)
    assert(spark.read.parquet(idx).count() === idxBefore)

    // batch-1 output == the BATCH rule (cleanAgainstHistory) driven
    // with the same history spans — the shared-seam pin
    val histPages = Seq(1L -> page(ownA, withBoiler = true),
      2L -> page(ownB, withBoiler = false)).toDF("doc_id", "text")
    val histSpans = graft.ops.TextOps.c4Spans(
      graft.ops.TextOps.c4Surv(histPages))
    val expected = graft.ops.TextOps.cleanAgainstHistory(replay, histSpans)
      .select("doc_id", "n_dropped", "final_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val got = spark.read.parquet(out).filter(col("ingest_batch") === 1)
      .select("doc_id", "n_dropped", "final_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("micro-batches leak no persisted blocks (the scoped-sweep contract)") {
    // the seams inside a batch (c4Surv/c4Spans/hist/cleaned cuts) are
    // unreachable from the applier — Caches.scoped must free exactly
    // what each batch persisted, or a long-running stream grows 2-3
    // frames per batch forever (round-10 review finding)
    import spark.implicits._
    val out = Files.createTempDirectory("c4l_out").toString
    val idx = Files.createTempDirectory("c4l_idx").toString
    val before = spark.sparkContext.getPersistentRDDs.size
    for (b <- 0 until 4) {
      val pages = Seq((b * 10 + 1).toLong -> page(
        ownA.map(_.replace("one", s"v$b")), withBoiler = true))
        .toDF("doc_id", "text")
      TextStreams.c4ApplyBatch(spark, pages, b.toLong, out, idx)
    }
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "persisted-RDD count must return to baseline after every batch")
  }

  test("doc_id-ordered arrival reproduces the batch full cleaner") {
    import spark.implicits._
    val src = Files.createTempDirectory("c4s2_src").toString
    val out = Files.createTempDirectory("c4s2_out").toString
    val idx = Files.createTempDirectory("c4s2_idx").toString
    val ckpt = Files.createTempDirectory("c4s2_ckpt").toString
    val all = Seq(
      1L -> page(ownA, withBoiler = true),
      2L -> page(ownB, withBoiler = true),  // boiler repeat: drops
      3L -> page(ownC, withBoiler = false),
      4L -> page(ownA.map(_.replace("one", "twelve")), withBoiler = true))
    publish(src, "b0.parquet", all.take(2))
    val q = TextStreams.c4CleanStream(spark, src, out, idx, ckpt)
    try {
      q.processAllAvailable()
      publish(src, "b1.parquet", all.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val batchFull = graft.ops.TextOps.textC4CleanOn(all.toDF("doc_id", "text"))
      .select("doc_id", "n_dropped", "final_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_dropped", "final_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(streamed === batchFull,
      "in-order arrival must equal the one-shot batch cleaner")
  }
}
