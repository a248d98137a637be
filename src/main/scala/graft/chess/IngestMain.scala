package graft.chess

import org.apache.spark.sql.SparkSession

/** Batch ingestion driver — the Spark equivalent of the reference's
  * ingest_lichess.py CLI: PGN in, month-partitioned player-game-role
  * parquet out, with resumable per-player state for incremental runs.
  *
  * Usage: runMain graft.chess.IngestMain <pgnPath> <outDir> [stateDir]
  *
  * With `stateDir`: reads the prior [[ChessPipeline.statsState]] table
  * if present (counters continue across runs exactly as the
  * reference's `cum_files_{y}_{m}.json.zst` carry-over,
  * ingester.py:60-86), and writes the updated state back. Without it,
  * one job over the full input range gives identical numbers — the
  * windows span everything.
  */
object IngestMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IngestMain <pgnPath> <outDir> [stateDir]")
    val Array(pgnPath, outDir) = args.take(2)
    val stateDir = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val prior = stateDir.flatMap { d =>
      val cur = new org.apache.hadoop.fs.Path(d, "player_state")
      val old = new org.apache.hadoop.fs.Path(d, "player_state_old")
      val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
      // crash recovery: if a previous run died between retiring `cur`
      // and renaming the new state into place, the retired copy is
      // still the last committed state — use it
      val p = if (fs.exists(cur)) Some(cur)
        else if (fs.exists(old)) Some(old)
        else None
      p.map(path => spark.read.parquet(path.toString))
    }
    val raw = spark.read.format("pgn").load(pgnPath)
    val games = ChessPipeline.parseGames(raw)
    ChessPipeline.writePartitioned(
      ChessPipeline.toPlayerGameRole(ChessPipeline.withStats(games, prior)), outDir)
    stateDir.foreach { d =>
      // three-step swap: write next, retire cur to _old, rename next
      // into place. A crash at ANY point leaves a readable committed
      // state: before the retire, `cur` is intact; between retire and
      // rename, `_old` is the last committed state and the read path
      // above recovers from it. (The earlier delete-then-rename had a
      // window with no state at all.)
      val next = ChessPipeline.statsState(games, prior)
      next.write.mode("overwrite").parquet(s"$d/player_state_next")
      val conf = spark.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(conf)
      val cur = new org.apache.hadoop.fs.Path(d, "player_state")
      val old = new org.apache.hadoop.fs.Path(d, "player_state_old")
      // rename returns false instead of throwing on most FS impls — a
      // silently failed swap followed by the old-state cleanup would
      // destroy the last committed state
      def mustRename(from: org.apache.hadoop.fs.Path,
          to: org.apache.hadoop.fs.Path): Unit =
        require(fs.rename(from, to), s"state swap failed: $from -> $to")
      if (fs.exists(cur)) {
        // normal path: retire the stale old copy, then cur -> old
        fs.delete(old, true)
        mustRename(cur, old)
      }
      // recovery path (cur absent, `old` was the prior source): old IS
      // the last committed state — keep it until `next` is in place
      mustRename(new org.apache.hadoop.fs.Path(d, "player_state_next"), cur)
      fs.delete(old, true) // state committed; drop the retired copy
    }
    spark.stop()
  }
}
