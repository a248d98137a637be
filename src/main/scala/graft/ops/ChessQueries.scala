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

  /** B5 on chess data: most-active players (the reference's
    * White-count/Black-count join shape, eda.ipynb).
    */
  def chessTopPlayers(s: SparkSession, dir: String): DataFrame = {
    val pgr = chessPipeline(s, dir)
    pgr.groupBy("Player")
      .agg(count(lit(1)).as("n_games"),
        max(col("PlayerElo_max")).as("peak_elo"))
      .orderBy(desc("n_games"), col("Player"))
      .limit(20)
  }

  val queries: Seq[Q] = Seq(
    Q("pgn_games", pgnGames, None),
    Q("chess_pipeline", chessPipeline, None),
    Q("chess_top_players", chessTopPlayers, None)
  )
}
