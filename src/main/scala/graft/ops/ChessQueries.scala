package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chess.{ChessPipeline, SamplePgn}

/** Chess-pipeline query surface (SURVEY §2.A): the DSv2 PGN source +
  * ChessPipeline driven end-to-end on the deterministic sample corpus
  * (the driver's sf dirs hold only parquet, so PGN queries generate
  * their input).
  *
  * Oracle strategy: the EDA queries run over [[GamesPq]] — the parsed
  * games materialized once per JVM to a deterministic parquet path —
  * so DuckDB can `read_parquet` the SAME rows and hash-check them
  * (hard oracle green instead of rows-only). `chess_pipeline` /
  * `pgn_games` still read the PGN source directly (they demonstrate
  * the scan itself), and the HLL query stays rows-only by nature.
  */
object ChessQueries {

  private def rawPgn(s: SparkSession): DataFrame =
    s.read.format("pgn").load(SamplePgn.ensureWritten())

  /** Parsed sample games as parquet at a fixed versioned path,
    * written AT MOST ONCE per version: the first JVM to need it
    * writes to a unique temp dir and publishes with one atomic
    * rename; every other JVM (and every other thread) reuses the
    * published copy. Queries re-read the files Spark-side; the
    * driver's DuckDB oracle reads them via `read_parquet` — both
    * engines see byte-identical rows, which is what upgrades the
    * chess EDA checks from rows-only to full hash compare.
    */
  private object GamesPq {
    // the cross-JVM cache key: the sample corpus' content version
    // (shared constant, so a corpus change can't skew the two caches)
    // plus this object's own schema version (bump when parseGames'
    // output changes). Stale data would stay SELF-consistent — both
    // engines read the same files — but lag the code, hence the loud
    // versioning; ChessPipelineSpec pins the semantics themselves.
    private val SchemaVersion = 1
    val path: String = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"),
        s"graft_chess_games_pq_c${SamplePgn.ContentVersion}s$SchemaVersion")
      .toString
    @volatile private var checked = false

    def apply(s: SparkSession): DataFrame = {
      if (!checked) synchronized {
        if (!checked) {
          val dest = java.nio.file.Paths.get(path)
          if (!java.nio.file.Files.exists(dest.resolve("_SUCCESS"))) {
            // write to a unique temp dir, publish with one atomic
            // rename: concurrent JVMs never overwrite files another
            // process (Spark re-read or the external DuckDB oracle)
            // may be mid-scan on — the input is deterministic, so a
            // concurrent winner published identical rows
            val tmp = java.nio.file.Paths.get(
              path + ".tmp-" + java.util.UUID.randomUUID())
            try {
              ChessPipeline.parseGames(rawPgn(s))
                .write.mode("overwrite").parquet(tmp.toString)
              try java.nio.file.Files.move(tmp, dest,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch {
                case e: java.nio.file.FileSystemException =>
                  // only swallow when a concurrent winner actually
                  // published a COMPLETE copy — any other move
                  // failure (permissions, tampered partial dest)
                  // must surface, not silently pin a broken cache
                  if (!java.nio.file.Files.exists(dest.resolve("_SUCCESS")))
                    throw e
              }
            } finally graft.LocalFs.deleteRecursively(tmp)
          }
          checked = true
        }
      }
      s.read.parquet(path)
    }
  }

  private def pq(cols: String = "*"): String =
    s"SELECT $cols FROM read_parquet('${GamesPq.path}/*.parquet')"

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

  /** A5–A7 hard-oracled ON CHESS DATA: the player-game-role doubling
    * with running per-player stats, computed from the materialized
    * games parquet (so DuckDB can RECOMPUTE the same semantics —
    * doubling, cumulative counts, running own-Elo max, the
    * elo_max_faced == elo_max reference quirk, Elo binning, Result
    * reversal — from the same input rows with window functions; the
    * `events`-analog oracles cover these shapes too, but this one
    * pins them on the real pipeline output). Hash-based random
    * columns are excluded: xxhash64 is not DuckDB-expressible
    * (they stay covered by `chess_pipeline` rows + specs).
    */
  def chessRoleStats(s: SparkSession, dir: String): DataFrame =
    ChessPipeline.toPlayerGameRole(ChessPipeline.withStats(GamesPq(s)))
      .select(col("ID"), col("DateTime"), col("Event"), col("Result"),
        col("Role_player"), col("Player"), col("Opponent"),
        col("PlayerElo"), col("OpponentElo"),
        col("PlayerElo_max"), col("PlayerElo_max_faced"),
        col("Player_cum_games_total"), col("Player_cum_games_type"),
        col("Opponent_cum_games_total"), col("Opponent_cum_games_type"),
        col("PlayerElo_bin"))
      .orderBy(col("ID"), col("Role_player"))

  /** B5 on chess data: most-active players, matching eda.ipynb cell 8
    * exactly — white-counts INNER-joined with black-counts on player
    * (so a player who only ever played one color is dropped, as in the
    * reference), n_games = count_white + count_black, top 20. Only
    * divergence: a `player` tiebreak for a deterministic result (the
    * reference's sort is on n_games alone).
    */
  def chessTopPlayers(s: SparkSession, dir: String): DataFrame =
    chessTopPlayersOn(games(s))

  /** [[chessTopPlayers]] on an arbitrary one-row-per-game frame — the
    * seam [[graft.Report]] drives against real ingest output.
    */
  def chessTopPlayersOn(g: DataFrame): DataFrame = {
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

  private def games(s: SparkSession): DataFrame = GamesPq(s)

  /** eda.ipynb "Total number of games". */
  def chessCount(s: SparkSession, dir: String): DataFrame =
    chessCountOn(games(s))

  def chessCountOn(g: DataFrame): DataFrame =
    g.agg(count(lit(1)).as("num_games"))

  /** eda.ipynb "number of players (approx)" — HLL++ like polars'
    * approx_n_unique.
    */
  def chessApproxPlayers(s: SparkSession, dir: String): DataFrame =
    chessApproxPlayersOn(games(s))

  def chessApproxPlayersOn(g: DataFrame): DataFrame =
    g.agg(
      approx_count_distinct(col("White")).as("n_white"),
      approx_count_distinct(col("Black")).as("n_black"))

  /** eda.ipynb "How often does white win?" — recode + proportion. */
  def chessWinnerProp(s: SparkSession, dir: String): DataFrame =
    chessWinnerPropOn(games(s))

  def chessWinnerPropOn(g: DataFrame): DataFrame = {
    val winner = when(col("Result") === "1-0", "white")
      .when(col("Result") === "0-1", "black")
      .when(col("Result") === "1/2-1/2", "draw")
    val counts = g.select(winner.as("winner"))
      .filter(col("winner").isNotNull)
      .groupBy("winner").agg(count(lit(1)).as("cnt"))
    Eda.withProportion(counts)
      .orderBy(desc("proportion"), col("winner"))
  }

  /** eda.ipynb "how did the game end?". */
  def chessTermination(s: SparkSession, dir: String): DataFrame =
    chessTerminationOn(games(s))

  def chessTerminationOn(g: DataFrame): DataFrame = {
    val counts = g.groupBy("Termination").agg(count(lit(1)).as("cnt"))
    Eda.withProportion(counts)
      .orderBy(desc("cnt"), col("Termination"))
  }

  /** eda.ipynb "How many games are played?" per day. */
  def chessDailyCounts(s: SparkSession, dir: String): DataFrame =
    chessDailyCountsOn(games(s))

  /** [[chessDailyCounts]] on an arbitrary one-row-per-game frame —
    * the seam [[graft.Report]] drives against real ingest output.
    */
  def chessDailyCountsOn(g: DataFrame): DataFrame =
    g.groupBy(to_date(col("DateTime")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day")

  /** eda.ipynb high-Elo daily counts (both Elos > threshold). */
  def chessDailyHighElo(s: SparkSession, dir: String, minElo: Int = 2000): DataFrame =
    chessDailyHighEloOn(games(s), minElo)

  /** [[chessDailyHighElo]]'s games-frame seam. */
  def chessDailyHighEloOn(g: DataFrame, minElo: Int = 2000): DataFrame =
    g.filter(col("WhiteElo") > minElo && col("BlackElo") > minElo)
      .groupBy(to_date(col("DateTime")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day")

  /** eda.ipynb top-20 openings. */
  def chessTopOpenings(s: SparkSession, dir: String): DataFrame =
    chessTopOpeningsOn(games(s))

  /** [[chessTopOpenings]]'s games-frame seam. */
  def chessTopOpeningsOn(g: DataFrame): DataFrame =
    g.groupBy("Opening").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("Opening"))
      .limit(20)

  /** The parsed sample-corpus games parquet (the EDA queries' input)
    * — exposed for [[graft.Report]]'s no-argument mode.
    */
  private[graft] def sampleGames(s: SparkSession): DataFrame = GamesPq(s)

  val queries: Seq[Q] = Seq(
    Q("pgn_games", pgnGames, None),
    Q("chess_pipeline", chessPipeline, None),
    Q("chess_top_players", chessTopPlayers, Some(
      s"""WITH g AS (${pq()}),
         |w AS (SELECT White AS player, count(*) AS count_white FROM g GROUP BY 1),
         |b AS (SELECT Black AS player, count(*) AS count_black FROM g GROUP BY 1)
         |SELECT w.player, count_white + count_black AS n_games
         |FROM w JOIN b USING (player)
         |ORDER BY n_games DESC, player LIMIT 20""".stripMargin)),
    Q("chess_count", chessCount, Some(
      s"SELECT count(*) AS num_games FROM (${pq()})")),
    Q("chess_approx_players", chessApproxPlayers, None), // HLL: rows-only by nature
    Q("chess_winner_prop", chessWinnerProp, Some(
      s"""WITH c AS (
         |  SELECT CASE WHEN Result = '1-0' THEN 'white'
         |              WHEN Result = '0-1' THEN 'black'
         |              WHEN Result = '1/2-1/2' THEN 'draw' END AS winner,
         |         count(*) AS cnt
         |  FROM (${pq()})
         |  WHERE Result IN ('1-0', '0-1', '1/2-1/2')
         |  GROUP BY 1)
         |SELECT winner, cnt,
         |       CAST(cnt AS DOUBLE) / CAST((SELECT sum(cnt) FROM c) AS DOUBLE) AS proportion
         |FROM c ORDER BY proportion DESC, winner""".stripMargin)),
    Q("chess_termination", chessTermination, Some(
      s"""WITH c AS (
         |  SELECT Termination, count(*) AS cnt FROM (${pq()}) GROUP BY 1)
         |SELECT Termination, cnt,
         |       CAST(cnt AS DOUBLE) / CAST((SELECT sum(cnt) FROM c) AS DOUBLE) AS proportion
         |FROM c ORDER BY cnt DESC, Termination""".stripMargin)),
    Q("chess_daily_counts", chessDailyCounts, Some(
      s"""SELECT CAST(DateTime AS DATE) AS day, count(*) AS cnt
         |FROM (${pq()}) GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("chess_daily_high_elo", (s, d) => chessDailyHighElo(s, d), Some(
      s"""SELECT CAST(DateTime AS DATE) AS day, count(*) AS cnt
         |FROM (${pq()})
         |WHERE WhiteElo > 2000 AND BlackElo > 2000
         |GROUP BY 1 ORDER BY 1""".stripMargin)),
    Q("chess_top_openings", chessTopOpenings, Some(
      s"""SELECT Opening, count(*) AS cnt FROM (${pq()})
         |GROUP BY 1 ORDER BY cnt DESC, Opening LIMIT 20""".stripMargin)),
    // the ingestion core's semantics recomputed independently in
    // DuckDB window SQL from the same games parquet: role doubling,
    // Result reversal, cumulative counts, running own-Elo max, the
    // elo_max_faced == elo_max quirk, and (lo, hi] binning
    Q("chess_role_stats", chessRoleStats, Some(
      s"""WITH g AS (${pq()}),
         |long AS (
         |  SELECT ID, DateTime, Event, 'White' AS role, White AS name, WhiteElo AS elo FROM g
         |  UNION ALL
         |  SELECT ID, DateTime, Event, 'Black' AS role, Black AS name, BlackElo AS elo FROM g),
         |stats AS (
         |  SELECT ID, role,
         |         CAST(count(*) OVER w1 AS INT) AS cum_total,
         |         CAST(count(*) OVER w2 AS INT) AS cum_type,
         |         CAST(coalesce(max(elo) OVER w2, 0) AS INT) AS elo_max
         |  FROM long
         |  WINDOW w1 AS (PARTITION BY name ORDER BY DateTime, ID
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         w2 AS (PARTITION BY name, Event ORDER BY DateTime, ID
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |wide AS (
         |  SELECT g.*,
         |         ws.cum_total AS w_total, ws.cum_type AS w_type, ws.elo_max AS w_max,
         |         bs.cum_total AS b_total, bs.cum_type AS b_type, bs.elo_max AS b_max
         |  FROM g
         |  JOIN stats ws ON ws.ID = g.ID AND ws.role = 'White'
         |  JOIN stats bs ON bs.ID = g.ID AND bs.role = 'Black'),
         |pgr AS (
         |  SELECT ID, DateTime, Event, Result, 'White' AS Role_player,
         |         White AS Player, Black AS Opponent,
         |         WhiteElo AS PlayerElo, BlackElo AS OpponentElo,
         |         w_max AS PlayerElo_max, w_max AS PlayerElo_max_faced,
         |         w_total AS Player_cum_games_total, w_type AS Player_cum_games_type,
         |         b_total AS Opponent_cum_games_total, b_type AS Opponent_cum_games_type
         |  FROM wide
         |  UNION ALL
         |  SELECT ID, DateTime, Event,
         |         CASE WHEN Result = '1-0' THEN '0-1'
         |              WHEN Result = '0-1' THEN '1-0' ELSE Result END,
         |         'Black', Black, White, BlackElo, WhiteElo,
         |         b_max, b_max, b_total, b_type, w_total, w_type
         |  FROM wide)
         |SELECT *,
         |       '(' || CAST(CAST(ceil(PlayerElo / 200.0) * 200 - 200 AS BIGINT) AS VARCHAR)
         |           || ', '
         |           || CAST(CAST(ceil(PlayerElo / 200.0) * 200 AS BIGINT) AS VARCHAR)
         |           || ']' AS PlayerElo_bin
         |FROM pgr ORDER BY ID, Role_player""".stripMargin))
  )
}
