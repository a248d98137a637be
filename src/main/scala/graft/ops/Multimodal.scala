package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY §2.D12): image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction as batched per-partition transforms.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked STUB (deterministic fake dimensions derived from the
  * payload hash). Everything Spark-side is real and is what would ship:
  *  - schema: (media_id, media BINARY, meta STRUCT<format, n_bytes,
  *    crc>) — the payload stays opaque bytes end-to-end, no base64
  *    round-trips, no driver collection;
  *  - format sniffing on magic bytes is a plain Catalyst expression
  *    (narrow, codegen);
  *  - decode runs via `mapPartitions` over a typed Dataset in fixed
  *    batches of 64 records — the same batch shape `mapInPandas`/Arrow
  *    would use — so a real codec drops in by replacing
  *    [[StubCodec.decode]] only;
  *  - partitioning: decode is narrow (no shuffle); at 100 TB you size
  *    `spark.sql.files.maxPartitionBytes` so one partition's payloads
  *    fit in executor memory, which this plumbing respects by never
  *    materializing more than one batch per task at a time.
  */
object Multimodal {

  val PngMagic: Array[Byte] = Array(0x89.toByte, 'P', 'N', 'G')
  val JpegMagic: Array[Byte] = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  val WavMagic: Array[Byte] = Array('R', 'I', 'F', 'F')

  /** Deterministic synthetic media table derived from `documents`:
    * payload = magic(doc_id%3) ++ utf8(text). Stands in for a real
    * parquet/Lance scan of a binary column.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        concat(
          element_at(
            array(lit(PngMagic), lit(JpegMagic), lit(WavMagic)),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
          encode(col("text"), "UTF-8")).as("media"))

  /** Magic-byte format sniff — pure expression, no decode. */
  def sniffFormat(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(startswith(media, lit(PngMagic)), "png")
      .when(startswith(media, lit(JpegMagic)), "jpeg")
      .when(startswith(media, lit(WavMagic)), "wav")
      .otherwise("unknown")

  final case class MediaIn(media_id: Long, media: Array[Byte], format: String)
  final case class Decoded(media_id: Long, format: String, n_bytes: Long,
      crc: Long, width: Int, height: Int, n_frames: Int)
  final case class Resized(media_id: Long, format: String,
      src_w: Int, src_h: Int, dst_w: Int, dst_h: Int, thumb_crc: Long)
  final case class Frame(media_id: Long, frame_idx: Int, n_frames: Int,
      frame_crc: Long)

  /** STUB codec — the one seam a real deployment replaces. Deterministic
    * fake: dimensions from a payload hash. Signature (batch in, batch
    * out) matches an Arrow-batched decoder.
    */
  object StubCodec {
    private def crcOf(bytes: Array[Byte]): Long = {
      val crc = new java.util.zip.CRC32
      crc.update(bytes)
      crc.getValue
    }

    /** Single source of truth for the stub's frame-count model (shared
      * by [[decode]] and [[frameCount]] so the metadata and the sample
      * plan can never disagree).
      */
    private def framesOf(h: Long, format: String): Int =
      if (format == "wav") (h % 300).toInt + 1 else 1

    def decode(batch: Seq[MediaIn]): Seq[Decoded] = batch.map { m =>
      val h = crcOf(m.media)
      Decoded(m.media_id, m.format, m.media.length.toLong, h,
        width = (h % 1920).toInt + 1, height = (h % 1080).toInt + 1,
        n_frames = framesOf(h, m.format))
    }

    /** Decode + scale into a bounding box, aspect ratio preserved. The
      * box-fit arithmetic is the real thing; the pixel work is the
      * stub (thumb_crc stands in for the resized payload).
      */
    def resize(batch: Seq[MediaIn], box: Int): Seq[Resized] =
      decode(batch).map { d =>
        val scale = math.min(1.0, box.toDouble / math.max(d.width, d.height))
        val dw = math.max(1, math.round(d.width * scale).toInt)
        val dh = math.max(1, math.round(d.height * scale).toInt)
        Resized(d.media_id, d.format, d.width, d.height, dw, dh,
          thumb_crc = crcOf(s"${d.crc}:${dw}x$dh".getBytes("UTF-8")))
      }

    /** Container-header frame count — real codecs read this without
      * decoding any frames, which is what makes sample-then-decode
      * cheaper than decode-then-sample.
      */
    def frameCount(m: MediaIn): Int = framesOf(crcOf(m.media), m.format)

    /** Decode ONLY the requested frames of one media payload. The
      * payload hash is computed ONCE, not per frame — decode cost must
      * scale with frames kept.
      */
    def decodeFrames(m: MediaIn, idxs: Seq[Int], total: Int): Seq[Frame] = {
      val h = crcOf(m.media)
      idxs.map(i => Frame(m.media_id, i, total,
        frame_crc = crcOf(s"$h#$i".getBytes("UTF-8"))))
    }
  }

  val BatchSize = 64

  /** D12: sniff → batched stub-decode → typed metadata rows. */
  def mmMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = mediaTable(s, dir)
      .withColumn("format", sniffFormat(col("media")))
      .as[MediaIn]
    in.mapPartitions(rows =>
        rows.grouped(BatchSize).flatMap(b => StubCodec.decode(b.toSeq)))
      .toDF()
      .orderBy("media_id")
  }

  val ResizeBox = 256
  val FrameStep = 30

  /** D12b: batched resize-to-thumbnail — decode, fit into a
    * [[ResizeBox]]² box (aspect preserved, never upscaled), re-encode.
    * Narrow `mapPartitions` in [[BatchSize]] batches, same seam as
    * [[mmMeta]]: a real image library replaces [[StubCodec.resize]]
    * only; the batching, schema and box-fit math ship as-is.
    */
  def mmResize(s: SparkSession, dir: String): DataFrame =
    resizeOf(mediaTable(s, dir)).orderBy("media_id")

  /** The resize pipeline on a prepared media table — split out so
    * specs can vary the INPUT partitioning (batch boundaries form
    * inside `mapPartitions`, so only input partitioning exercises
    * them).
    */
  private[ops] def resizeOf(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media
      .withColumn("format", sniffFormat(col("media")))
      .as[MediaIn]
      .mapPartitions(rows =>
        rows.grouped(BatchSize).flatMap(b => StubCodec.resize(b.toSeq, ResizeBox)))
      .toDF()
  }

  /** D12c: frame sampling — every [[FrameStep]]-th frame of each
    * media payload (always including frame 0). The sample plan comes
    * from the container HEADER ([[StubCodec.frameCount]], no frame
    * decode), so only sampled frames are ever decoded — decode cost
    * scales with frames KEPT, not frames stored, which is the entire
    * point of sampling at 100 TB. One narrow pass; output is one row
    * per sampled frame.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .withColumn("format", sniffFormat(col("media")))
      .as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        val total = StubCodec.frameCount(m)
        StubCodec.decodeFrames(m, 0 until total by FrameStep, total)
      })
      .toDF()
      .orderBy("media_id", "frame_idx")
  }

  /** Format distribution over the sniffed (never decoded) column —
    * the "query metadata without touching pixels" path.
    */
  def mmFormatDist(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(sniffFormat(col("media")).as("format"),
        length(col("media")).cast("long").as("n_bytes"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
      .orderBy("format")

  val queries: Seq[Q] = Seq(
    Q("mm_meta", mmMeta, None),
    // CRC-derived dims are not SQL-expressible: rows-only + specs
    Q("mm_resize", mmResize, None),
    Q("mm_frames", mmFrameSample, None),
    // the media table derives deterministically from documents
    // (magic(doc_id%3) ++ utf8(text)), so the no-decode metadata path
    // is SQL-expressible and oracled
    Q("mm_format_dist", mmFormatDist, Some(
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |            ELSE 'wav' END AS format,
        |       count(*) AS n,
        |       CAST(sum(octet_length(encode(text)) + 4) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin))
  )
}
