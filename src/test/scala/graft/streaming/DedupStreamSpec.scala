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
}
