package graft.chess

import org.apache.spark.sql.SparkSession

/** Batch ingestion driver — the Spark equivalent of the reference's
  * ingest_lichess.py CLI: PGN in, month-partitioned player-game-role
  * parquet out, with resumable per-player state for incremental runs.
  *
  * Usage: runMain graft.chess.IngestMain <pgnPath> <outDir> [stateDir]
  *
  * `pgnPath` may instead be `--month=YYYY-MM`: the monthly lichess
  * dump is then staged via [[Acquire.fetchMonth]] (the reference's
  * give-me-a-month entry point, ingest_lichess.py:9-27) into
  * `GRAFT_STAGING_DIR` (default /tmp/graft_staging), honoring
  * `GRAFT_DUMP_BASE_URL` as a mirror / `file://` override, and the
  * staged `.pgn.zst` is ingested.
  *
  * With `stateDir`: reads the prior [[ChessPipeline.statsState]] table
  * if present (counters continue across runs exactly as the
  * reference's `cum_files_{y}_{m}.json.zst` carry-over,
  * ingester.py:60-86), and writes the updated state back. Without it,
  * one job over the full input range gives identical numbers — the
  * windows span everything.
  */
object IngestMain {

  private val MonthArg = """--month=(\d{4})-(\d{2})""".r

  /** Usage/flag validation, shared by main (BEFORE paying Spark
    * startup) and run (for direct callers).
    */
  private def validateArgs(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IngestMain <pgnPath|--month=YYYY-MM> <outDir> [stateDir]")
    args(0) match {
      case MonthArg(_, _) => ()
      case p if p.startsWith("--") =>
        // a malformed flag must not fall through to "open it as a
        // path" — that surfaces as a baffling Path-does-not-exist
        throw new IllegalArgumentException(
          s"unrecognized option '$p' (expected --month=YYYY-MM)")
      case _ => ()
    }
  }

  def main(args: Array[String]): Unit = {
    validateArgs(args) // fail usage errors before Spark startup
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args,
      stagingDir = sys.env.getOrElse("GRAFT_STAGING_DIR", "/tmp/graft_staging"),
      baseUrl = sys.env.get("GRAFT_DUMP_BASE_URL"))
    finally spark.stop()
  }

  /** The whole ingest on a caller-owned session (main wraps it; specs
    * drive it directly — the e2e path from `--month` staging through
    * the range-partitioned monthly sink).
    */
  def run(spark: SparkSession, args: Array[String],
      stagingDir: String, baseUrl: Option[String]): Unit = {
    validateArgs(args)
    val pgnPath = args(0) match {
      case MonthArg(y, m) =>
        Acquire.fetchMonth(y.toInt, m.toInt, stagingDir, baseUrl).toString
      case p => p
    }
    val outDir = args(1)
    val stateDir = args.lift(2)

    val prior = stateDir.flatMap { d =>
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // StateSwap.resolve recovers the committed copy after a crash at
      // any point of a previous run's commit
      StateSwap.resolve(fs, d).map(p => spark.read.parquet(p.toString))
    }
    val raw = spark.read.format("pgn").load(pgnPath)
    val games = ChessPipeline.parseGames(raw)
    ChessPipeline.writePartitioned(
      ChessPipeline.toPlayerGameRole(ChessPipeline.withStats(games, prior)), outDir)
    stateDir.foreach { d =>
      // stage the updated state, then run the crash-safe three-step
      // swap (see StateSwap: a crash at any point leaves a committed
      // copy that resolve() finds on the next run)
      ChessPipeline.statsState(games, prior)
        .write.mode("overwrite").parquet(s"$d/${StateSwap.Next}")
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(spark.sessionState.newHadoopConf())
      StateSwap.commit(fs, d)
    }
  }
}
