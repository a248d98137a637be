package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** E9d: continuous video near-dup against the persistent band index —
  * cross-batch NEAR-dups (a frame-perturbed copy, a transcoded MJPEG
  * twin — not byte-identical) must be caught via the index, a
  * replayed batch must be a no-op, and the admitted set must come
  * from the same survivor rule the batch oracle pins
  * (`dedup_video_incremental`). The ImageDedupStreamSpec battery, one
  * modality over — the stream shares [[ImageStreams.applyHashedBatch]]
  * so only the front-end is under test here.
  */
class VideoDedupStreamSpec extends SparkSpec {

  import graft.ops.Video.{VideoCodec, VideoGen}

  /** One pixel byte of one stored frame nudged by 1 (the VideoSpec
    * fixture): the smallest real edit a copy can carry.
    */
  private def perturbed(id: Long): Array[Byte] = {
    val b = VideoGen.aviBytes(id).clone()
    val h = VideoCodec.parseAvi(b)
    val (off, _) = h.frames(0)
    b(off) = (b(off) ^ 1).toByte
    b
  }

  /** The DIB master transcoded to MJPEG — same frames, lossy codec. */
  private def mjpegTwin(id: Long): Array[Byte] = {
    val b = VideoGen.aviBytes(id)
    val h = VideoCodec.parseAvi(b)
    val frames = (0 until h.nFrames).map { i =>
      val baos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(
        VideoCodec.decodeFrame(b, h, i), "jpg", baos), "no jpeg writer")
      baos.toByteArray
    }
    VideoGen.aviFrom(h.width, h.height, isDib = false, frames)
  }

  private def publish(srcDir: String, name: String,
      rows: Seq[(Long, Array[Byte])]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("vs_pub").toString
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

  test("cross-batch video near-dups caught; within-batch collapse; replay is a no-op") {
    val src = Files.createTempDirectory("vs_src").toString
    val out = Files.createTempDirectory("vs_out").toString
    val idx = Files.createTempDirectory("vs_idx").toString
    val ckpt = Files.createTempDirectory("vs_ckpt").toString

    // batch 0: two far-apart DIB clips (0/4 pinned apart in
    // VideoSpec) — both admitted
    publish(src, "b0.parquet", Seq(
      0L -> VideoGen.aviBytes(0L), 4L -> VideoGen.aviBytes(4L)))
    val q = VideoStreams.dedupStream(spark, src, out, idx, ckpt)
    try {
      q.processAllAvailable()
      assert(outIds(out) === Seq(0L, 4L))
      // batch 1: 210 = frame-perturbed copy of ADMITTED 0 (cross-batch
      // → dropped via the index); 300 = MJPEG transcode of ADMITTED 0
      // (lossy cross-codec arrival → dropped); 10 = new far-apart DIB
      // clip (admitted); 100 = byte-identical copy of 10 — in-batch
      // dup of a CLEAN smaller arrival → dominated, dropped
      publish(src, "b1.parquet", Seq(
        210L -> perturbed(0L), 300L -> mjpegTwin(0L),
        10L -> VideoGen.aviBytes(10L), 100L -> VideoGen.aviBytes(10L)))
      q.processAllAvailable()
      assert(outIds(out) === Seq(0L, 4L, 10L))
      // the index holds 8 band rows per admitted clip, nothing else
      assert(spark.read.parquet(s"$idx/hashes")
        .select("dhash_hi", "dhash_lo").distinct().count() === 3)
    } finally q.stop()

    // replay committed batch 1 (crash before the offset commit):
    // dynamic overwrite + own-batch history exclusion make it a no-op
    import spark.implicits._
    val replay = Seq(210L -> perturbed(0L), 300L -> mjpegTwin(0L),
        10L -> VideoGen.aviBytes(10L), 100L -> VideoGen.aviBytes(10L))
      .toDF("media_id", "media")
    VideoStreams.applyBatch(spark, replay, batchId = 1L, out, idx)
    assert(outIds(out) === Seq(0L, 4L, 10L))
    assert(spark.read.parquet(s"$idx/hashes")
      .select("dhash_hi", "dhash_lo").distinct().count() === 3)

    // and batch-1's admitted set matches the BATCH rule (the shared
    // newImagesAgainstHistory seam) driven with the same history
    val histMedia = Seq(0L -> VideoGen.aviBytes(0L),
        4L -> VideoGen.aviBytes(4L))
      .toDF("media_id", "media")
    val expected = graft.ops.Multimodal.newImagesAgainstHistory(
        graft.ops.Video.videoHashFrameOf(replay, includeLossy = true),
        graft.ops.Multimodal.bandRowsOf(
          graft.ops.Video.videoHashFrameOf(histMedia, includeLossy = true)))
      .select("media_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(spark.read.parquet(out)
      .filter(col("ingest_batch") === 1).select("media_id").collect()
      .map(_.getLong(0)).sorted.toSeq === expected)
  }
}
