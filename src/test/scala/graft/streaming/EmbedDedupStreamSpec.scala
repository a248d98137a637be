package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** E9b: continuous embedding near-dup against the persistent signature
  * index — cross-batch NEAR-dups (not just exact digests) must be
  * caught, a replayed batch must be a no-op, and the admitted set must
  * come from the same survivor rule the batch oracle pins
  * (`dedup_embed_incremental`).
  */
class EmbedDedupStreamSpec extends SparkSpec {

  private val Dim = 8
  private def vec(xs: Double*): Array[Float] = {
    val a = new Array[Float](Dim)
    xs.zipWithIndex.foreach { case (x, i) => a(i) = x.toFloat }
    a
  }
  // two near-dup families (a: dims 0/1, b: dims 2/3) + orthogonal
  // singletons; cosines within a family ≈ 0.996-0.999, across ≈ 0
  private val v1 = vec(1.0)
  private val v2 = vec(0.97, -0.08)               // ~v1 (cos ≈ 0.997)
  private val v3 = vec(0.0, 1.0)                  // unique
  private val v4 = vec(0.98, 0.05)                // ~v1, arrives batch 1
  private val v5 = vec(0.0, 0.0, 1.0, 0.05)
  private val v6 = vec(0.0, 0.0, 0.99, -0.03)     // ~v5 (cos ≈ 0.997)
  private val v7 = vec(0.0, 0.0, 0.0, 1.0)        // unique

  private def publish(srcDir: String, name: String,
      rows: Seq[(Long, Array[Float])]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("es_pub").toString
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.iterator().asScala.toSeq)
      .find(_.getFileName.toString.endsWith(".parquet"))
    assert(part.isDefined, "no part file produced")
    Files.move(part.get, Paths.get(srcDir, name))
  }

  private def outIds(out: String): Seq[Long] =
    spark.read.parquet(out).select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq

  test("cross-batch near-dups caught; within-batch collapse; replay is a no-op") {
    val src = Files.createTempDirectory("es_src").toString
    val out = Files.createTempDirectory("es_out").toString
    val idx = Files.createTempDirectory("es_idx").toString
    val ckpt = Files.createTempDirectory("es_ckpt").toString

    // batch 0: 2 is a NEAR-dup (not byte-identical) of 1 -> collapses
    // to 1; 3 unique
    publish(src, "b0.parquet", Seq(1L -> v1, 2L -> v2, 3L -> v3))
    val q = EmbedStreams.dedupStream(spark, src, out, idx, ckpt)
    try {
      q.processAllAvailable()
      assert(outIds(out) === Seq(1L, 3L))
      // batch 1: 4 is a near-dup of ADMITTED 1 (cross-batch -> dropped
      // via the persistent index); 5/6 in-batch near-dups of a new
      // direction (keep 5); 7 unique
      publish(src, "b1.parquet",
        Seq(4L -> v4, 5L -> v5, 6L -> v6, 7L -> v7))
      q.processAllAvailable()
      assert(outIds(out) === Seq(1L, 3L, 5L, 7L))
      // the index holds signatures + vectors for exactly the admitted set
      assert(spark.read.parquet(s"$idx/vecs").select("vec_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L, 7L))
      assert(spark.read.parquet(s"$idx/sigs")
        .select("vec_id").distinct().count() === 4)
    } finally q.stop()

    // replay committed batch 1 (crash before the offset commit):
    // dynamic overwrite + own-batch history exclusion make it a no-op
    import spark.implicits._
    val replay = Seq(4L -> v4, 5L -> v5, 6L -> v6, 7L -> v7)
      .toDF("vec_id", "embedding")
    EmbedStreams.applyBatch(spark, replay, batchId = 1L, out, idx)
    assert(outIds(out) === Seq(1L, 3L, 5L, 7L))
    assert(spark.read.parquet(s"$idx/vecs").count() === 4)
    assert(spark.read.parquet(s"$idx/sigs")
      .select("vec_id").distinct().count() === 4)

    // and batch-1's admitted set matches the BATCH rule (the shared
    // newVectorsAgainstHistory seam) driven with the same history
    val hist = Seq(1L -> v1, 3L -> v3).toDF("vec_id", "embedding")
    val batch1 = Seq(4L -> v4, 5L -> v5, 6L -> v6, 7L -> v7)
      .toDF("vec_id", "embedding")
    val expected = graft.ops.Dedup.newVectorsAgainstHistory(
        batch1,
        graft.ops.Similarity.srpTableBuckets(hist, "vec_id", "embedding",
          graft.ops.Dedup.embedPlanes, graft.ops.Dedup.embedTables),
        hist, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(spark.read.parquet(out)
      .filter(col("ingest_batch") === 1).select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq === expected)
  }
}
