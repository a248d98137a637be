package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chess.{ChessPipeline, SamplePgn}

/** Chess-pipeline query surface (SURVEY §2.A): the DSv2 PGN source +
  * ChessPipeline driven end-to-end on the deterministic sample corpus
  * (the driver's sf dirs hold only parquet, so PGN queries generate
  * their input; rows-only checks — the windowed-stats semantics are
  * oracled via their `events`-table analogs in [[Relational]] and
  * unit-tested in ChessPipelineSpec).
  */
object ChessQueries {

  private def rawPgn(s: SparkSession): DataFrame =
    s.read.format("pgn").load(SamplePgn.ensureWritten())

  /** A1/A2: raw distributed PGN scan (tags + movetext). */
  def pgnGames(s: SparkSession, dir: String): DataFrame =
    rawPgn(s).select(
      element_at(col("tags"), "Site").as("site"),
      element_at(col("tags"), "Event").as("event"),
      size(col("tags")).as("n_tags"),
      length(col("movetext")).as("movetext_len"))
      .orderBy("site")

  /** A2–A9: the full ingestion pipeline to player-game-role form. */
  def chessPipeline(s: SparkSession, dir: String): DataFrame =
    ChessPipeline.fromPgn(rawPgn(s))

  /** B5 on chess data: most-active players, matching eda.ipynb cell 8
    * exactly — white-counts INNER-joined with black-counts on player
    * (so a player who only ever played one color is dropped, as in the
    * reference), n_games = count_white + count_black, top 20. Only
    * divergence: a `player` tiebreak for a deterministic result (the
    * reference's sort is on n_games alone).
    */
  def chessTopPlayers(s: SparkSession, dir: String): DataFrame = {
    val g = games(s)
    val w = g.groupBy(col("White").as("player"))
      .agg(count(lit(1)).as("count_white"))
    val b = g.groupBy(col("Black").as("player"))
      .agg(count(lit(1)).as("count_black"))
    w.join(b, "player")
      .select(col("player"),
        (col("count_white") + col("count_black")).as("n_games"))
      .orderBy(desc("n_games"), col("player"))
      .limit(20)
  }

  private def games(s: SparkSession): DataFrame =
    ChessPipeline.parseGames(rawPgn(s))

  /** eda.ipynb "Total number of games". */
  def chessCount(s: SparkSession, dir: String): DataFrame =
    games(s).agg(count(lit(1)).as("num_games"))

  /** eda.ipynb "number of players (approx)" — HLL++ like polars'
    * approx_n_unique.
    */
  def chessApproxPlayers(s: SparkSession, dir: String): DataFrame =
    games(s).agg(
      approx_count_distinct(col("White")).as("n_white"),
      approx_count_distinct(col("Black")).as("n_black"))

  /** eda.ipynb "How often does white win?" — recode + proportion. */
  def chessWinnerProp(s: SparkSession, dir: String): DataFrame = {
    val winner = when(col("Result") === "1-0", "white")
      .when(col("Result") === "0-1", "black")
      .when(col("Result") === "1/2-1/2", "draw")
    val counts = games(s).select(winner.as("winner"))
      .filter(col("winner").isNotNull)
      .groupBy("winner").agg(count(lit(1)).as("cnt"))
    counts.withColumn("proportion",
        col("cnt").cast("double") /
          sum(col("cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy()).cast("double"))
      .orderBy(desc("proportion"), col("winner"))
  }

  /** eda.ipynb "how did the game end?". */
  def chessTermination(s: SparkSession, dir: String): DataFrame = {
    val counts = games(s).groupBy("Termination").agg(count(lit(1)).as("cnt"))
    counts.withColumn("proportion",
        col("cnt").cast("double") /
          sum(col("cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy()).cast("double"))
      .orderBy(desc("cnt"), col("Termination"))
  }

  /** eda.ipynb "How many games are played?" per day. */
  def chessDailyCounts(s: SparkSession, dir: String): DataFrame =
    games(s).groupBy(to_date(col("DateTime")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day")

  /** eda.ipynb high-Elo daily counts (both Elos > threshold). */
  def chessDailyHighElo(s: SparkSession, dir: String, minElo: Int = 2000): DataFrame =
    games(s).filter(col("WhiteElo") > minElo && col("BlackElo") > minElo)
      .groupBy(to_date(col("DateTime")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day")

  /** eda.ipynb top-20 openings. */
  def chessTopOpenings(s: SparkSession, dir: String): DataFrame =
    games(s).groupBy("Opening").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("Opening"))
      .limit(20)

  val queries: Seq[Q] = Seq(
    Q("pgn_games", pgnGames, None),
    Q("chess_pipeline", chessPipeline, None),
    Q("chess_top_players", chessTopPlayers, None),
    Q("chess_count", chessCount, None),
    Q("chess_approx_players", chessApproxPlayers, None),
    Q("chess_winner_prop", chessWinnerProp, None),
    Q("chess_termination", chessTermination, None),
    Q("chess_daily_counts", chessDailyCounts, None),
    Q("chess_daily_high_elo", (s, d) => chessDailyHighElo(s, d), None),
    Q("chess_top_openings", chessTopOpenings, None)
  )
}
