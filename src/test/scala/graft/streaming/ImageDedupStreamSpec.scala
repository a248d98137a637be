package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** E9c: continuous image near-dup against the persistent dHash band
  * index — cross-batch NEAR-dups (a resized re-encode, a jpeg twin —
  * not byte-identical) must be caught via the index, a replayed batch
  * must be a no-op, and the admitted set must come from the same
  * survivor rule the batch oracle pins (`dedup_image_incremental`).
  */
class ImageDedupStreamSpec extends SparkSpec {

  import graft.ops.Multimodal.{JdkCodec, MediaGen, MediaIn}

  private def pngOf(id: Long): Array[Byte] = MediaGen.payload(id)

  private def resized(id: Long): Array[Byte] =
    JdkCodec.resize(Seq(MediaIn(id, pngOf(id), "png")),
      math.max(MediaGen.imageWidth(id), MediaGen.imageHeight(id)) / 2)
      .head.thumb

  private def jpegTwin(id: Long): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pngOf(id)))
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", baos), "no jpeg writer")
    baos.toByteArray
  }

  private def publish(srcDir: String, name: String,
      rows: Seq[(Long, Array[Byte])]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("is_pub").toString
    rows.toDF("media_id", "media").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.iterator().asScala.toSeq)
      .find(_.getFileName.toString.endsWith(".parquet"))
    assert(part.isDefined, "no part file produced")
    Files.move(part.get, Paths.get(srcDir, name))
  }

  private def outIds(out: String): Seq[Long] =
    spark.read.parquet(out).select("media_id").collect()
      .map(_.getLong(0)).sorted.toSeq

  test("cross-batch image near-dups caught; within-batch collapse; replay is a no-op") {
    val src = Files.createTempDirectory("is_src").toString
    val out = Files.createTempDirectory("is_out").toString
    val idx = Files.createTempDirectory("is_idx").toString
    val ckpt = Files.createTempDirectory("is_ckpt").toString

    // batch 0: two far-apart pngs (fixtures pinned apart in
    // DedupImageSpec) — both admitted
    publish(src, "b0.parquet", Seq(0L -> pngOf(0L), 3L -> pngOf(3L)))
    val q = ImageStreams.dedupStream(spark, src, out, idx, ckpt)
    try {
      q.processAllAvailable()
      assert(outIds(out) === Seq(0L, 3L))
      // batch 1: 30 = resized re-encode of ADMITTED 0 (cross-batch →
      // dropped via the index); 33 = jpeg twin of ADMITTED 0 (lossy
      // cross-format arrival → dropped; fixture 0 is the
      // jpeg-stable planted pair DedupImageSpec pins — the larger
      // noise fixtures are jpeg-hostile by design of the generator);
      // 21 = new far-apart png (admitted); 210 = byte-identical copy
      // of 21 — in-batch dup of a CLEAN smaller arrival → dominated,
      // dropped (the NEAR-dup in-batch case rides the same seam,
      // pinned in DedupImageSpec)
      publish(src, "b1.parquet", Seq(
        30L -> resized(0L), 33L -> jpegTwin(0L),
        21L -> pngOf(21L), 210L -> pngOf(21L)))
      q.processAllAvailable()
      assert(outIds(out) === Seq(0L, 3L, 21L))
      // the index holds 8 band rows per admitted image, nothing else
      assert(spark.read.parquet(s"$idx/hashes")
        .select("dhash_hi", "dhash_lo").distinct().count() === 3)
    } finally q.stop()

    // replay committed batch 1 (crash before the offset commit):
    // dynamic overwrite + own-batch history exclusion make it a no-op
    import spark.implicits._
    val replay = Seq(30L -> resized(0L), 33L -> jpegTwin(0L),
        21L -> pngOf(21L), 210L -> pngOf(21L))
      .toDF("media_id", "media")
    ImageStreams.applyBatch(spark, replay, batchId = 1L, out, idx)
    assert(outIds(out) === Seq(0L, 3L, 21L))
    assert(spark.read.parquet(s"$idx/hashes")
      .select("dhash_hi", "dhash_lo").distinct().count() === 3)

    // and batch-1's admitted set matches the BATCH rule (the shared
    // newImagesAgainstHistory seam) driven with the same history
    val histMedia = Seq(0L -> pngOf(0L), 3L -> pngOf(3L))
      .toDF("media_id", "media")
      .withColumn("format", graft.ops.Multimodal.sniffFormat(col("media")))
    val batchMedia = Seq(30L -> resized(0L), 33L -> jpegTwin(0L),
        21L -> pngOf(21L), 210L -> pngOf(21L))
      .toDF("media_id", "media")
      .withColumn("format", graft.ops.Multimodal.sniffFormat(col("media")))
    val expected = graft.ops.Multimodal.newImagesAgainstHistory(
        graft.ops.Multimodal.hashFrameOf(batchMedia, includeLossy = true),
        graft.ops.Multimodal.bandRowsOf(
          graft.ops.Multimodal.hashFrameOf(histMedia, includeLossy = true)))
      .select("media_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(spark.read.parquet(out)
      .filter(col("ingest_batch") === 1).select("media_id").collect()
      .map(_.getLong(0)).sorted.toSeq === expected)
  }

  /** dHash-controlled fixture: a 9×8 png whose cell brightnesses walk
    * the given 64-bit pattern (bit i set ⇔ right cell brighter), so
    * every fixture's hash is exactly the pattern — diverse index
    * partitions on demand.
    */
  private def patternPng(bits: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (cy <- 0 until 8) {
      var b = 128
      for (cx <- 0 until 9) {
        val v = b & 255
        img.setRGB(cx, cy, (v << 16) | (v << 8) | v)
        if (cx < 8) {
          val i = cy * 8 + cx
          b += (if (((bits >>> i) & 1L) == 1L) 8 else -8)
        }
      }
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", baos), "no png writer")
    baos.toByteArray
  }

  test("hashes index: a trickle batch reads only its probed (band, bgrp) partitions") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def filesScanned(df: DataFrame): Long = {
      df.collect()
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    }
    def parquetFiles(dir: String): Long = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
    }
    val rng = new scala.util.Random(47)
    val root = Files.createTempDirectory("e9cprune").toString
    val out = s"$root/out"; val idx = s"$root/idx"
    val patterns = Seq.fill(4)(Seq.fill(48)(rng.nextLong()))
    for ((ps, b) <- patterns.zipWithIndex)
      ImageStreams.applyBatch(spark,
        ps.zipWithIndex.map { case (p, i) =>
          ((b * 1000 + i).toLong, patternPng(p)) }.toDF("media_id", "media"),
        b.toLong, out, idx)
    val hashesDir = s"$idx/hashes"
    val total = parquetFiles(hashesDir)
    assert(total >= 64, s"hashes index too coarse to measure pruning: $total files")

    // 1 image probes ≤ 8 bands × 5 groups = 40 of the 128 (band,
    // bgrp) partitions — strictly less than the index holds
    val tiny = Seq((9999L, patternPng(patterns.head.head)))
      .toDF("media_id", "media")
    val tinyHashed = graft.ops.Multimodal.hashFrameOf(
      tiny.withColumn("format", graft.ops.Multimodal.sniffFormat(col("media"))),
      includeLossy = true)
    val pruned = ImageStreams.historyBandsRead(spark, hashesDir, 4L, tinyHashed)
    val scanned = filesScanned(pruned)
    assert(scanned < total * 40 / 100,
      s"pruning ineffective: scanned $scanned of $total hashes files")

    // no probe-able row lost: the admitted set for the tiny batch is
    // the same against the pruned and the full index (byte-identical
    // pattern of an admitted image → dropped both ways)
    val full = spark.read.parquet(hashesDir)
      .filter(col("ingest_batch") =!= 4L)
      .select("dhash_hi", "dhash_lo", "band", "bhash")
    val k1 = graft.ops.Multimodal.newImagesAgainstHistory(tinyHashed, pruned)
      .select("media_id").collect().map(_.getLong(0)).toSet
    val k2 = graft.ops.Multimodal.newImagesAgainstHistory(tinyHashed, full)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(k1 === k2)
    assert(k1.isEmpty, "the planted exact dup must be dropped either way")
  }
}
