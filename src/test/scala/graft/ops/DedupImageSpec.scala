package graft.ops

import graft.SparkSpec

/** Planted near-dup pins for the perceptual-hash image dedup (D12d):
  * the DuckDB oracle proves hash + keep-rule arithmetic, this proves
  * the PERCEPTUAL claim — a resized, re-encoded copy of an image
  * lands within the Hamming budget of its source and collapses onto
  * it, while unrelated images stay apart.
  */
class DedupImageSpec extends SparkSpec {

  import Multimodal.{JdkCodec, MediaGen, MediaIn}

  private def pngOf(id: Long): Array[Byte] = {
    require(MediaGen.format(id) == "png", s"id $id is not a png fixture")
    MediaGen.payload(id)
  }

  /** Half-size bilinear resize, re-encoded PNG (the D12b path). */
  private def resized(id: Long): Array[Byte] =
    JdkCodec.resize(Seq(MediaIn(id, pngOf(id), "png")),
      math.max(MediaGen.imageWidth(id), MediaGen.imageHeight(id)) / 2)
      .head.thumb

  test("a resized re-encoded copy collapses onto its source image") {
    import spark.implicits._
    // ids ≡ 0 mod 3 are png fixtures; 0/3/21 are pairwise far apart
    // in dHash space (measured), 210 is a half-size copy of 0
    val rows = Seq(
      (0L, pngOf(0L), "png"),
      (3L, pngOf(3L), "png"),
      (21L, pngOf(21L), "png"),
      (210L, resized(0L), "png"))
    val out = Multimodal.dedupImageOn(
        rows.toDF("media_id", "media", "format"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(210L) === 0L, "resized copy must keep its source id")
    assert(out(0L) === 0L && out(3L) === 3L && out(21L) === 21L,
      "unrelated images must stay their own keep groups")
  }

  test("dHash distance: copy within budget, unrelated images far apart") {
    def dh(m: Array[Byte]) = JdkCodec.dhash(MediaIn(0L, m, "png"))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val src = dh(pngOf(0L))
    val copy = dh(resized(0L))
    val other = dh(pngOf(3L))
    assert(ham(src, copy) <= 10, s"copy distance ${ham(src, copy)} > 10")
    assert(ham(src, other) > 10, s"unrelated distance ${ham(src, other)} <= 10")
  }

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  /** The same pixels re-encoded lossy (the cross-format twin a real
    * multimodal crawl hits daily: one master stored as both png and
    * jpeg).
    */
  private def jpegTwin(id: Long): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pngOf(id)))
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", baos), "no jpeg writer")
    baos.toByteArray
  }

  test("a lossless source and its thumbnail-normalized twin hash within the budget") {
    // the two registered forms (direct png hash vs normalized hash)
    // must agree on lossless content, or a mixed deployment would
    // split one image's copies across the two operators' keep groups
    for (id <- Seq(0L, 3L, 21L)) {
      val direct = JdkCodec.dhash(MediaIn(id, pngOf(id), "png"))
      val normed = JdkCodec.dhashNormalized(MediaIn(id, pngOf(id), "png"),
        Multimodal.ResizeBox)
      assert(ham(direct, normed) <= 10,
        s"png $id: direct-vs-normalized distance ${ham(direct, normed)} > 10")
    }
  }

  test("cross-format planted pair: a jpeg re-encode collapses onto its png source") {
    import spark.implicits._
    val rows = Seq(
      (0L, pngOf(0L), "png"),
      (3L, pngOf(3L), "png"),
      (21L, pngOf(21L), "png"),
      (300L, jpegTwin(0L), "jpeg"))
    val out = Multimodal.dedupImageOn(
        rows.toDF("media_id", "media", "format"), includeLossy = true)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.size === 4, "lossy-inclusive form must hash the jpeg too")
    assert(out(300L) === 0L, "jpeg twin must keep its png source id")
    assert(out(0L) === 0L && out(3L) === 3L && out(21L) === 21L)
  }

  test("lossless form excludes jpeg; lossy-inclusive keeps png singletons stable") {
    import spark.implicits._
    val rows = Seq(
      (0L, pngOf(0L), "png"),
      (300L, jpegTwin(0L), "jpeg"))
    val lossless = Multimodal.dedupImageOn(rows.toDF("media_id", "media", "format"))
      .collect().map(_.getLong(0)).toSet
    assert(lossless === Set(0L), "registered oracle form is lossless-only")
  }
}
