package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming embedding operators (SURVEY §2.E9b): continuous NEAR-dup
  * admission over a vector stream.
  */
object EmbedStreams {

  /** E9b: continuous embedding near-dup against a PERSISTENT signature
    * index — the streaming twin of `dedup_embed_incremental` (D5c) and
    * the near-dup extension of [[TextStreams.dedupStream]] (E9, exact
    * digests): each micro-batch's vectors are SRP-signed row-locally,
    * the signatures flip-mask-probe the on-disk signature index (the
    * history is bucketed ONCE, at admission — it is never re-signed,
    * never rescanned), candidates are exact-cosine verified against
    * the admitted vectors, and only history-clean, within-batch-
    * surviving vectors are admitted: appended to the output, the
    * signature index, and the vector table.
    *
    * The survivor rule is [[graft.ops.Dedup.newVectorsAgainstHistory]]
    * — the SAME code path the batch oracle pins, so batch and stream
    * cannot drift.
    *
    * Exactly-once replay protocol, index/checkpoint lifetime contract
    * and layout all follow [[TextStreams.dedupStream]]: all three
    * writes partition by `ingest_batch` under dynamic overwrite, and
    * the history reads EXCLUDE the current batch id, so a replayed
    * batch (crash before the offset commit) overwrites exactly its
    * own partitions with identical rows. `indexDir` holds two
    * subtables — `sigs` (vec_id, tbl, bucket) and `vecs`
    * (vec_id, embedding) — because candidate generation needs only
    * the bucket rows while exact verification joins the vectors; at
    * 100 TB the sigs table is the small hot index and vectors move
    * only for candidate rows.
    */
  def dedupStream(spark: SparkSession, embDir: String, outDir: String,
      indexDir: String, checkpointDir: String,
      threshold: Double = 0.9): StreamingQuery = {
    val schema = spark.read.parquet(embDir).schema
    spark.readStream.schema(schema).parquet(embDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch.toDF(), batchId, outDir, indexDir, threshold)
      }
      .start()
  }

  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, outDir: String, indexDir: String,
      threshold: Double = 0.9): Unit = {
    val sigsDir = s"$indexDir/sigs"
    val vecsDir = s"$indexDir/vecs"
    val emb = batch.select(col("vec_id"), col("embedding"))
    def hist(dir: String, cols: Seq[String]): DataFrame =
      if (nonEmptyDir(spark, dir))
        spark.read.parquet(dir)
          .filter(col("ingest_batch") =!= batchId) // replay: own rows aren't history
          .select(cols.map(col): _*)
      else if (cols == Seq("vec_id", "embedding")) emb.limit(0)
      else emb.select(col("vec_id"), lit(0).as("tbl"), lit(0L).as("bucket"))
        .limit(0)
    val kept = graft.ops.Dedup.newVectorsAgainstHistory(
        emb,
        hist(sigsDir, Seq("vec_id", "tbl", "bucket")),
        hist(vecsDir, Seq("vec_id", "embedding")),
        threshold)
      .withColumn("ingest_batch", lit(batchId))
      .transform(graft.Lineage.cut) // 3 sinks below; also self-overwrite
    try {
      graft.ops.Similarity.srpTableBuckets(kept, "vec_id", "embedding",
          graft.ops.Dedup.embedPlanes, graft.ops.Dedup.embedTables)
        .join(kept.select("vec_id", "ingest_batch"), "vec_id")
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(sigsDir)
      kept.write.mode("overwrite")
        .partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(vecsDir)
      kept.write.mode("overwrite")
        .partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(outDir)
    } finally graft.Lineage.free(kept)
  }

  private def nonEmptyDir(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
