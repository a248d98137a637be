package graft.ops

import graft.SparkSpec

/** Pins for the video modality (D12g) that the DuckDB oracle cannot
  * carry: container round-trip on BOTH codecs, the PERCEPTUAL claim
  * (a frame-perturbed copy collapses onto its source; a transcoded
  * MJPEG twin pairs with its DIB master under the lossy-inclusive
  * form), sampled-decode arithmetic, and the incremental survivor
  * rule — the DedupImageSpec battery, one modality over.
  */
class VideoSpec extends SparkSpec {

  import Video.{VideoCodec, VideoGen}

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("container round-trip: parse reports the generator contract, both codecs") {
    for (id <- 0L to 9L) {
      val h = VideoCodec.parseAvi(VideoGen.aviBytes(id))
      assert(h.codec === VideoGen.codec(id), s"id $id codec")
      assert(h.width === VideoGen.width(id), s"id $id width")
      assert(h.height === VideoGen.height(id), s"id $id height")
      assert(h.nFrames === VideoGen.frameCount(id), s"id $id frames")
    }
  }

  test("DIB frame decode reproduces the generator pixels exactly") {
    val id = 4L // dib
    val b = VideoGen.aviBytes(id)
    val h = VideoCodec.parseAvi(b)
    val img = VideoCodec.decodeFrame(b, h, 1)
    for (x <- 0 until h.width; y <- 0 until h.height)
      assert((img.getRGB(x, y) & 0xFFFFFF) === VideoGen.framePixel(id, 1, x, y),
        s"pixel ($x,$y) of frame 1")
    // and the exact luma stat matches a direct arithmetic sum
    val want = (0 until h.width).flatMap(x => (0 until h.height).map { y =>
      val p = VideoGen.framePixel(id, 1, x, y)
      (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)).toLong
    }).sum
    assert(VideoCodec.lumaSum(img) === want)
  }

  /** One pixel byte of one stored frame nudged by 1 — the smallest
    * real edit a copy can carry.
    */
  private def perturbed(id: Long): Array[Byte] = {
    val b = VideoGen.aviBytes(id).clone()
    val h = VideoCodec.parseAvi(b)
    val (off, _) = h.frames(0)
    b(off) = (b(off) ^ 1).toByte
    b
  }

  test("a frame-perturbed copy collapses onto its source; unrelated clips stay apart") {
    import spark.implicits._
    // even ids are dib fixtures; 0/4/10 measured far apart in
    // signature space; 210 is a perturbed copy of 0
    val rows = Seq(
      (0L, VideoGen.aviBytes(0L)),
      (4L, VideoGen.aviBytes(4L)),
      (10L, VideoGen.aviBytes(10L)),
      (210L, perturbed(0L)))
    val hashed = Video.videoHashFrameOf(
      rows.toDF("media_id", "media"), includeLossy = false)
    val out = Multimodal.pairHashFrame(hashed, maxHamming = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(210L) === 0L, "perturbed copy must keep its source id")
    assert(out(0L) === 0L && out(4L) === 4L && out(10L) === 10L,
      "unrelated clips must stay their own keep groups")
  }

  /** The DIB master transcoded to MJPEG — same frames, lossy codec
    * (the cross-codec twin a real video crawl stores daily).
    */
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

  test("a transcoded MJPEG twin pairs with its DIB master under the lossy-inclusive form") {
    import spark.implicits._
    val rows = Seq(
      (0L, VideoGen.aviBytes(0L)),
      (4L, VideoGen.aviBytes(4L)),
      (300L, mjpegTwin(0L)))
    val hashed = Video.videoHashFrameOf(
      rows.toDF("media_id", "media"), includeLossy = true)
    val out = Multimodal.pairHashFrame(hashed, maxHamming = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(300L) === 0L, "MJPEG twin must keep its DIB master's id")
    assert(out(4L) === 4L, "unrelated clip must stay its own keep group")
    // the registered lossless form must NOT see the mjpeg clip at all
    val lossless = Video.videoHashFrameOf(
      rows.toDF("media_id", "media"), includeLossy = false)
    assert(lossless.collect().map(_.getLong(0)).toSet === Set(0L, 4L))
  }

  test("signature distance: perturbed copy within budget, unrelated clips far") {
    def vh(b: Array[Byte]) = VideoCodec.videoHash(b, VideoCodec.parseAvi(b))
    val src = vh(VideoGen.aviBytes(0L))
    val copy = vh(perturbed(0L))
    val other = vh(VideoGen.aviBytes(4L))
    assert(ham(src, copy) <= 10, s"copy distance ${ham(src, copy)}")
    assert(ham(src, other) > 10, s"unrelated distance ${ham(src, other)}")
  }

  test("header-planned sampling decodes ceil(n/4) frames per clip") {
    for (id <- Seq(0L, 2L, 6L)) {
      val n = VideoGen.frameCount(id)
      assert(VideoCodec.sampledIdxs(n).length === (n + 3) / 4, s"id $id")
    }
  }

  test("incremental admission: history hit drops, clean rep survives, dup collapses") {
    import spark.implicits._
    val histHash = VideoCodec.videoHash(VideoGen.aviBytes(0L),
      VideoCodec.parseAvi(VideoGen.aviBytes(0L)))
    val newHash = VideoCodec.videoHash(VideoGen.aviBytes(4L),
      VideoCodec.parseAvi(VideoGen.aviBytes(4L)))
    val hashed = Seq(
      (0L, histHash._1, histHash._2),    // history
      (250L, histHash._1, histHash._2),  // batch: exact history dup -> drop
      (251L, newHash._1, newHash._2),    // batch: clean rep -> admit
      (252L, newHash._1, newHash._2))    // batch: dominated by 251 -> drop
      .toDF("media_id", "dhash_hi", "dhash_lo")
    val admitted = Video.dedupVideoIncrementalOn(hashed, splitId = 250L)
      .collect().map(_.getLong(0)).toSet
    assert(admitted === Set(251L))
  }
}
