package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Doc

/** E9: continuous dedup against the persistent digest index — must
  * reproduce the batch incremental-dedup semantics across micro
  * batches, and a replayed batch (the foreachBatch crash window) must
  * be a no-op.
  */
class DedupStreamSpec extends SparkSpec {

  /** Write docs as ONE parquet file atomically published into the
    * streamed dir (write to a side dir, move the part file in).
    */
  private def publish(srcDir: String, name: String, docs: Seq[Doc]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("ds_pub").toString
    docs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
    // Files.list holds a directory handle until closed (the Files.walk
    // lesson, LocalFs.deleteRecursively)
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.iterator().asScala.toSeq)
      .find(_.getFileName.toString.endsWith(".parquet"))
    assert(part.isDefined, "no part file produced")
    Files.move(part.get, Paths.get(srcDir, name))
  }

  private def d(id: Long, text: String) = Doc(id, text, "en", "s", text.length)

  test("streaming dedup == batch incremental semantics; replay is a no-op") {
    val src = Files.createTempDirectory("ds_src").toString
    val out = Files.createTempDirectory("ds_out").toString
    val idx = Files.createTempDirectory("ds_idx").toString
    val ckpt = Files.createTempDirectory("ds_ckpt").toString

    // batch 0 present before start (defines the stream schema):
    // in-batch dup 1/2, unique 3
    publish(src, "b0.parquet",
      Seq(d(1, "alpha beta"), d(2, "alpha beta"), d(3, "gamma delta")))
    val q = TextStreams.dedupStream(spark, src, out, idx, ckpt)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
      // batch 1: 4 duplicates history (dropped), 5/6 in-batch dups of
      // a NEW text (keep 5), 7 unique
      publish(src, "b1.parquet",
        Seq(d(4, "alpha beta"), d(5, "epsilon zeta"),
          d(6, "epsilon zeta"), d(7, "eta theta")))
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L, 7L))
      // the index holds exactly one digest per admitted text
      assert(spark.read.parquet(idx).count() === 4)
    } finally q.stop()

    // replay the committed batch 1 (crash before the offset commit):
    // dynamic overwrite + own-batch exclusion make it idempotent
    import spark.implicits._
    val replay = Seq(d(4, "alpha beta"), d(5, "epsilon zeta"),
      d(6, "epsilon zeta"), d(7, "eta theta")).toDF()
    TextStreams.applyBatch(spark, replay, batchId = 1L, out, idx)
    assert(spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L, 7L))
    assert(spark.read.parquet(idx).count() === 4)

    // and the streamed survivors match the BATCH incremental rule run
    // over the same corpus with the same history boundary
    val all = Seq(d(1, "alpha beta"), d(2, "alpha beta"), d(3, "gamma delta"),
      d(4, "alpha beta"), d(5, "epsilon zeta"), d(6, "epsilon zeta"),
      d(7, "eta theta")).toDF()
    val hist = all.filter(col("doc_id") <= 3)
      .select(md5(col("text").cast("binary")).as("tkey")).distinct()
    val batchKeyed = all.filter(col("doc_id") > 3)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("tkey"))
    val expected = graft.ops.Dedup.newAgainstHistory(batchKeyed, hist)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(spark.read.parquet(out)
      .filter(col("ingest_batch") === 1).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq === expected)
  }

  test("bloom prefilter ON: survivors byte-identical to OFF; broadcast probe in the plan") {
    import spark.implicits._
    val batches = Seq(
      Seq(d(1, "alpha beta"), d(2, "alpha beta"), d(3, "gamma delta")),
      Seq(d(4, "alpha beta"), d(5, "epsilon zeta"),
        d(6, "epsilon zeta"), d(7, "eta theta")),
      // a batch that is ALL dups (the filter's worst case: everything
      // lands in the maybe slice and must be exactly verified away)
      Seq(d(8, "alpha beta"), d(9, "eta theta")))

    def runAll(bloom: Option[Int]): (Seq[(Long, Long)], Long) = {
      val out = Files.createTempDirectory("ds_bl_out").toString
      val idx = Files.createTempDirectory("ds_bl_idx").toString
      batches.zipWithIndex.foreach { case (docs, i) =>
        TextStreams.applyBatch(spark, docs.toDF(), i.toLong, out, idx,
          bloomBits = bloom)
      }
      // ingest_batch comes back from the partition directory name as
      // an inferred INT — normalize for the comparison
      (spark.read.parquet(out)
        .select(col("doc_id"), col("ingest_batch").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
        spark.read.parquet(idx).count())
    }

    val (offRows, offIdx) = runAll(None)
    val (onRows, onIdx) = runAll(Some(1 << 12))
    assert(onRows === offRows) // identical (doc_id, batch) survivor set
    assert(onIdx === offIdx)
    assert(offRows.map(_._1) === Seq(1L, 3L, 5L, 7L))

    // plan guard: the enabled path probes a BROADCAST one-row filter
    // row-locally before the keyed anti-join (D1c's geometry, now in
    // the micro-batch plan)
    val keyed = batches.flatten.toDF()
      .withColumn("tkey", md5(col("text").cast("binary")))
    val hist = keyed.filter(col("doc_id") <= 3).select("tkey").distinct()
    val plan = TextStreams.survivors(keyed, hist, Some(1 << 12), 4)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("bloom_might_contain"), s"no bloom probe in:\n$plan")
    assert(plan.contains("broadcast"), s"no broadcast filter in:\n$plan")
    val planOff = TextStreams.survivors(keyed, hist, None, 4)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!planOff.contains("bloom_might_contain"))

    // streaming-plan skew guard (round 12): the per-batch survivor
    // rule must carry NO window anywhere — a micro-batch is a whole
    // crawl snapshot at 100 TB, and a tkey-partitioned rank would
    // serialize its viral digest into one task; the Collapse form
    // (groupBy + min_by) is what both paths must plan
    for ((p, which) <- Seq((plan, "bloom"), (planOff, "exact")))
      assert(!p.contains("window"),
        s"$which survivors plan contains a Window node:\n$p")
  }
}
