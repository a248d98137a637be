package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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
    * subtables — `sigs` (vec_id, tbl, bucket; sub-partitioned by
    * `bgrp`, the top [[SigGroupBits]] bucket bits, so each batch's
    * probe READS only the partitions its Hamming ball can touch
    * instead of the whole ever-growing history — see
    * [[probedGroups]]) and `vecs` (vec_id, embedding) — because
    * candidate generation needs only the bucket rows while exact
    * verification joins the vectors; at 100 TB the sigs table is the
    * small hot index and vectors move only for candidate rows.
    */
  def dedupStream(spark: SparkSession, embDir: String, outDir: String,
      indexDir: String, checkpointDir: String,
      threshold: Double = 0.9,
      embSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    // explicit schema lets the stream start on an EMPTY source dir
    // (r15 verdict item 5; the E12 decontamGateStream contract)
    val schema = embSchema.getOrElse(spark.read.parquet(embDir).schema)
    spark.readStream.schema(schema).parquet(embDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch.toDF(), batchId, outDir, indexDir, threshold)
      }
      .start()
  }

  /** Bucket-group dial for the sigs index layout: the index
    * partitions on (tbl, bgrp) where `bgrp` is the TOP `SigGroupBits`
    * bits of the SRP bucket (16 groups per table, 128 partitions per
    * ingest batch). Why the top bits: radius-1 probing flips ONE of
    * `embedPlanes` bits, so a probe leaves its base group unless the
    * flipped bit is one of the top 4 — a signature in table t probes
    * at most 1 + SigGroupBits of table t's 16 groups. Why tbl is in
    * the key: the 8 tables' buckets are independent, so without it a
    * single vector's 8 signatures already cover most of the 16
    * groups; per-table, a tiny batch touches ~40 of the 128
    * partitions. That probed set is what [[probedGroups]] computes
    * and the history read prunes by. (Partition-count note: a
    * long-lived deployment compacts old ingest batches — the
    * per-batch 128 directories are the price of probe-pruned reads,
    * and compaction merges them across batches, not across (tbl,
    * bgrp).)
    */
  private[streaming] val SigGroupBits = 4

  private def sigGroup(bucket: Column): Column =
    shiftrightunsigned(bucket, graft.ops.Dedup.embedPlanes - SigGroupBits)

  /** The (tbl, bucket-group) partitions the batch's multi-probe ball
    * can touch — the partition-prune set for the sigs-index read.
    * Bounded driver work by construction: the collect is over
    * distinct (tbl, group) pairs (≤ tables · 2^SigGroupBits rows),
    * and the flip-mask group offsets come from the SAME
    * [[graft.ops.Dedup.flipMasks]] definition the probe join uses, so
    * the pruned read can never drop a probe-able row.
    */
  private[streaming] def probedGroups(emb: DataFrame): Seq[(Int, Long)] = {
    val planes = graft.ops.Dedup.embedPlanes
    val base = graft.ops.Similarity.srpTableBuckets(emb, "vec_id", "embedding",
        planes, graft.ops.Dedup.embedTables)
      .select(col("tbl"), sigGroup(col("bucket")).as("g")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val maskGroups = graft.ops.Dedup.flipMasks(planes, probeRadius = 1)
      .map(_ >>> (planes - SigGroupBits)).distinct
    base.flatMap { case (t, g) => maskGroups.map(m => (t, g ^ m)) }
      .distinct.toSeq
  }

  /** The partition-pruned history-signature read — one seam so the
    * growth spec can assert actual file pruning on the exact plan the
    * stream runs. Restricting the read to the batch's probed (tbl,
    * bgrp) partitions is answer-identical (a sig outside the probe
    * ball cannot join) and turns the per-batch index read from
    * O(history) into O(partitions the batch actually probes) — the
    * ever-growing-table scan was round-8 verdict item 2.
    */
  private[streaming] def historySigsRead(spark: SparkSession, sigsDir: String,
      batchId: Long, emb: DataFrame): DataFrame = {
    val cond = probedGroups(emb).groupBy(_._1).map { case (t, pairs) =>
      col("tbl") === t && col("bgrp").isin(pairs.map(_._2): _*)
    }.reduceOption(_ || _).getOrElse(lit(false))
    spark.read.parquet(sigsDir)
      .filter(col("ingest_batch") =!= batchId) // replay: own rows aren't history
      .filter(cond)
      .select(col("vec_id"), col("tbl"), col("bucket"))
  }

  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, outDir: String, indexDir: String,
      threshold: Double = 0.9): Unit = graft.Caches.scoped(spark) {
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
    val histSigs =
      if (nonEmptyDir(spark, sigsDir)) historySigsRead(spark, sigsDir, batchId, emb)
      else hist(sigsDir, Seq("vec_id", "tbl", "bucket"))
    val kept = graft.ops.Dedup.newVectorsAgainstHistory(
        emb,
        histSigs,
        hist(vecsDir, Seq("vec_id", "embedding")),
        threshold)
      .withColumn("ingest_batch", lit(batchId))
      .transform(graft.Lineage.cut) // 3 sinks below; also self-overwrite
    try {
      graft.ops.Similarity.srpTableBuckets(kept, "vec_id", "embedding",
          graft.ops.Dedup.embedPlanes, graft.ops.Dedup.embedTables)
        .join(kept.select("vec_id", "ingest_batch"), "vec_id")
        .withColumn("bgrp", sigGroup(col("bucket")))
        .write.mode("overwrite")
        .partitionBy("ingest_batch", "tbl", "bgrp")
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
