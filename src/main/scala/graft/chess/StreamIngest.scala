package graft.chess

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ingestion — the streaming twin of [[IngestMain]]: tail a
  * staging directory (the one [[Acquire]] publishes monthly dumps
  * into, atomically, under hidden temps) with the streaming PGN
  * source, and run every micro-batch through the SAME batch pipeline —
  * parse → running stats with the prior-state carry → role doubling →
  * the dynamic-overwrite monthly sink — via `foreachBatch`, with the
  * crash-safe [[StateSwap]] commit per batch.
  *
  * Exactly-once across crashes: `foreachBatch` replays a batch whose
  * streaming offset was not yet committed, so the state commit
  * records the applied batch id INSIDE the committed state copy
  * (`_applied_batch`, an underscore file parquet readers ignore).
  * Replays are then no-ops ([[applyBatch]] checks the marker first),
  * and a crash BEFORE the state commit re-runs both writes — safe,
  * because the sink's dynamic partition overwrite is idempotent for
  * the same batch over the same prior state. Either way each dump's
  * games are applied to the counters exactly once.
  *
  * This is the architecture a 100 TB continuous pipeline wants: the
  * incremental core stays one battle-tested BATCH path (identical
  * numbers to a monolithic run — the two-batch==full-batch property),
  * and streaming contributes only arrival detection + offset
  * tracking. No second implementation of the stats semantics exists
  * to drift.
  */
object StreamIngest {

  private val Marker = "_applied_batch"

  /** Start the continuous ingest; the returned query runs until
    * stopped. `checkpointDir` is the streaming offset log (restart
    * resumes there); `stateDir` carries the per-player counters.
    *
    * `checkpointDir` and `stateDir` must live and die TOGETHER: the
    * replay protection compares this stream's batch ids against the
    * marker in the state copy, so pointing a FRESH checkpoint (ids
    * restart at 0) at an old state dir would silently skip batches.
    * Starting over means clearing both (and the sink).
    */
  def start(spark: SparkSession, stagingDir: String, outDir: String,
      stateDir: String, checkpointDir: String,
      movesMode: ChessPipeline.MovesMode = ChessPipeline.MovesMode.Omitted): StreamingQuery =
    spark.readStream.format("pgn").load(stagingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch.toDF(), batchId, outDir, stateDir, movesMode)
      }
      .start()

  /** One micro-batch through the batch pipeline, exactly once: skip
    * if this batch id is already recorded in the committed state
    * (offset-uncommitted replay after a crash), else sink write →
    * state write (with marker) → atomic state commit.
    */
  private[chess] def applyBatch(spark: SparkSession, rawBatch: DataFrame,
      batchId: Long, outDir: String, stateDir: String,
      movesMode: ChessPipeline.MovesMode): Unit = {
    val fs = new Path(stateDir).getFileSystem(spark.sessionState.newHadoopConf())
    val cur = StateSwap.resolve(fs, stateDir)
    if (cur.exists(p => readMarker(fs, p).exists(_ >= batchId)))
      return // replayed batch, already fully applied and committed
    val prior = cur.map(p => spark.read.parquet(p.toString))
    val games = ChessPipeline.parseGames(rawBatch, movesMode)
    ChessPipeline.writePartitioned(
      ChessPipeline.toPlayerGameRole(ChessPipeline.withStats(games, prior)),
      outDir)
    val next = s"$stateDir/${StateSwap.Next}"
    ChessPipeline.statsState(games, prior)
      .write.mode("overwrite").parquet(next)
    writeMarker(fs, new Path(next), batchId)
    StateSwap.commit(fs, stateDir)
  }

  private def readMarker(fs: FileSystem, stateCopy: Path): Option[Long] = {
    val p = new Path(stateCopy, Marker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def writeMarker(fs: FileSystem, stateCopy: Path, batchId: Long): Unit = {
    val out = fs.create(new Path(stateCopy, Marker), true)
    try out.write(batchId.toString.getBytes(UTF_8))
    finally out.close()
  }
}
