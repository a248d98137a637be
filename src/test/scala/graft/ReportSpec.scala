package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.chess.{ChessPipeline, PgnFixtures}

/** `graft.Report` against REAL ingest output: the round-7 version
  * passed its output dir as the queries' data-dir argument (harmless
  * only because the sample-corpus chess queries ignore the dir). The
  * contract pinned here: `run(spark, games, outDir)` reads ONLY from
  * the games frame, `gamesFromIngest` collapses a writePartitioned
  * player-game-role table back to one row per game, and the chart
  * CSVs computed from ingest output equal the ones computed from the
  * pre-doubling games frame.
  */
class ReportSpec extends SparkSpec {

  private def pgnDir(): String = {
    val d = Files.createTempDirectory("report_pgn")
    val body = (0 until 12).map(i =>
      PgnFixtures.gameTxt(i, if (i % 3 == 0) "2024.03.01" else "2024.04.02",
        time = f"10:${i % 60}%02d:00", sitePrefix = "rp")).mkString("\n")
    Files.writeString(d.resolve("t.pgn"), body)
    d.toString
  }

  test("report runs on writePartitioned ingest output; charts equal the games-frame answer") {
    val raw = spark.read.format("pgn").load(pgnDir())
    val games = ChessPipeline.withStats(ChessPipeline.parseGames(raw))
    val ingestDir = Files.createTempDirectory("report_ingest").toString
    ChessPipeline.writePartitioned(ChessPipeline.toPlayerGameRole(games),
      ingestDir)

    val fromIngest = Report.gamesFromIngest(spark.read.parquet(ingestDir))
    // one row per game, duplicate-free
    assert(fromIngest.count() === 12)
    assert(fromIngest.select("ID").distinct().count() === 12)

    val outDir = Files.createTempDirectory("report_out").toString
    Report.run(spark, fromIngest, outDir)

    for ((name, query) <- Report.Datasets) {
      val written = spark.read.option("header", "true").csv(s"$outDir/$name.csv")
      val expected = query(games)
      assert(written.count() === expected.count(), s"$name row count")
      // header round-trip: same column names in the same order
      assert(written.columns.toSeq === expected.columns.toSeq, s"$name columns")
      // values: CSV strings vs the frame re-rendered as strings
      val ws = written.collect().map(_.toSeq.map(String.valueOf)).toSeq
      val es = expected.collect()
        .map(_.toSeq.map(v => String.valueOf(v match {
          case d: java.sql.Date => d
          case other => other
        }))).toSeq
      assert(ws === es, s"$name values diverge between ingest-output and games-frame runs")
    }

    // the daily-count chart totals the corpus exactly
    val daily = spark.read.option("header", "true")
      .csv(s"$outDir/chess_daily_counts.csv")
    assert(daily.agg(sum(col("cnt").cast("long"))).head().getLong(0) === 12L)

    // the three chart cells render as real PNGs at the reference's
    // 1000×600 plot geometry (plotnine 10×6 in @ 100 dpi), and are
    // drawn-on (not blank canvases)
    for (n <- Seq("gamecount_plot", "highcount_plot", "opening_plot")) {
      val f = new java.io.File(s"$outDir/img/$n.png")
      assert(f.isFile, s"$n.png missing")
      val img = javax.imageio.ImageIO.read(f)
      assert(img.getWidth === Charts.Width && img.getHeight === Charts.Height,
        s"$n.png is ${img.getWidth}x${img.getHeight}")
      val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0,
        img.getWidth)
      assert(px.distinct.length > 2, s"$n.png has no drawn content")
    }
  }
}
