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

  /** STUB codec — the one seam a real deployment replaces. Deterministic
    * fake: dimensions from a payload hash. Signature (batch in, batch
    * out) matches an Arrow-batched decoder.
    */
  object StubCodec {
    def decode(batch: Seq[MediaIn]): Seq[Decoded] = batch.map { m =>
      val crc = new java.util.zip.CRC32
      crc.update(m.media)
      val h = crc.getValue
      Decoded(m.media_id, m.format, m.media.length.toLong, h,
        width = (h % 1920).toInt + 1, height = (h % 1080).toInt + 1,
        n_frames = if (m.format == "wav") (h % 300).toInt + 1 else 1)
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
