package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming video operators (SURVEY §2.E9d): continuous
  * perceptual-hash VIDEO near-dup admission over a media stream — the
  * fourth member of the persistent-index streaming-dedup family (E9
  * exact digests, E9b embedding cosine, E9c image dHash).
  *
  * The whole post-signature machinery — Hamming-1 band-index probe,
  * partition-pruned history read, exact-verify survivor rule,
  * exactly-once replay via dynamic overwrite + own-batch history
  * exclusion — is [[ImageStreams.applyHashedBatch]], shared verbatim:
  * the only video-specific code is the front-end that turns an AVI
  * byte column into the 128-bit per-clip signature
  * ([[graft.ops.Video.videoHashFrameOf]]: container parse, sampled
  * DIB/MJPEG frame decode, per-frame dHash, strict-majority fold).
  * Lossy (MJPEG) arrivals participate, exactly as jpeg images do in
  * E9c — a transcoded twin of an admitted master must be dropped.
  *
  * The survivor rule is the SAME code path the batch oracle pins
  * (`dedup_video_incremental` → [[graft.ops.Multimodal
  * .newImagesAgainstHistory]]), so batch and stream cannot drift.
  * At 100 TB the index holds 8 rows of 16-byte signature + band per
  * admitted clip; frame bytes stay in their arrival batch's tasks and
  * are never re-decoded.
  */
object VideoStreams {

  /** E9d: continuous video near-dup against the persistent band
    * index. Source rows: (media_id LONG, media BINARY) — an AVI per
    * row, both codecs.
    */
  def dedupStream(spark: SparkSession, mediaDir: String, outDir: String,
      indexDir: String, checkpointDir: String,
      maxHamming: Int = 10,
      mediaSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    // explicit schema lets the stream start on an EMPTY source dir
    // (r15 verdict item 5 — the eager infer threw before the first
    // file arrived; the E12 decontamGateStream contract)
    val schema = mediaSchema.getOrElse(spark.read.parquet(mediaDir).schema)
    spark.readStream.schema(schema).parquet(mediaDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch.toDF(), batchId, outDir, indexDir, maxHamming)
      }
      .start()
  }

  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, outDir: String, indexDir: String,
      maxHamming: Int = 10): Unit = {
    val hashed = graft.ops.Video.videoHashFrameOf(batch, includeLossy = true)
    ImageStreams.applyHashedBatch(spark, hashed, batchId, outDir, indexDir,
      maxHamming)
  }
}
