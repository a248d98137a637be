package graft.chess

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Continuous ingestion (A15): the streaming twin of IngestMain must
  * produce EXACTLY the batch pipeline's output — same rows, same
  * carried counters — and replaying a committed micro-batch (the
  * crash window foreachBatch exposes) must be a no-op.
  */
class StreamIngestSpec extends graft.SparkSpec {

  private def gameTxt(i: Int, date: String): String =
    PgnFixtures.gameTxt(i, date, time = s"10:0${i % 10}:00", sitePrefix = "si")

  private def rows(dir: String) =
    spark.read.parquet(dir).orderBy("ID", "Role_player")
      .collect().map(_.toSeq.map(String.valueOf)).toSeq

  test("continuous ingest == chained batch ingest, counters carried across batches") {
    val staging = Files.createTempDirectory("si_staging")
    val out = Files.createTempDirectory("si_out").toString
    val state = Files.createTempDirectory("si_state").toString
    val ckpt = Files.createTempDirectory("si_ckpt").toString

    val q = StreamIngest.start(spark, staging.toString, out, state, ckpt)
    try {
      // month 1 dump arrives (atomically, Acquire-style)
      val m1 = gameTxt(1, "2024.03.05") + "\n" + gameTxt(2, "2024.03.20")
      Files.writeString(staging.resolve(".m1.tmp"), m1)
      Files.move(staging.resolve(".m1.tmp"), staging.resolve("m1.pgn"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 4) // 2 games x 2 roles
      // month 2 dump arrives later: counters must CONTINUE
      val m2 = gameTxt(3, "2024.04.02") + "\n" + gameTxt(4, "2024.04.25")
      Files.writeString(staging.resolve(".m2.tmp"), m2)
      Files.move(staging.resolve(".m2.tmp"), staging.resolve("m2.pgn"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 8)
    } finally q.stop()

    // alice played White in all 4 games: her count in the last April
    // game is 4 only if the March batch's state carried
    val lastApril = spark.read.parquet(out)
      .filter(col("Player") === "alice" && col("year_month") === "2024_04")
      .agg(max(col("Player_cum_games_total"))).head().getInt(0)
    assert(lastApril === 4)

    // and the whole output is row-identical to the BATCH driver run
    // over the same two dumps in sequence (modulo the streaming
    // sink's extra ingest_batch partition column)
    val outB = Files.createTempDirectory("si_batch_out").toString
    val stateB = Files.createTempDirectory("si_batch_state").toString
    IngestMain.run(spark,
      Array(staging.resolve("m1.pgn").toString, outB, stateB), "/tmp", None)
    IngestMain.run(spark,
      Array(staging.resolve("m2.pgn").toString, outB, stateB), "/tmp", None)
    def noBatchCol(dir: String) = {
      val df = spark.read.parquet(dir).drop("ingest_batch")
      df.orderBy("ID", "Role_player")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
    }
    assert(noBatchCol(out) === noBatchCol(outB))
  }

  test("a month split across two micro-batches accumulates — no clobber") {
    val staging = Files.createTempDirectory("sm_staging")
    val out = Files.createTempDirectory("sm_out").toString
    val state = Files.createTempDirectory("sm_state").toString
    val ckpt = Files.createTempDirectory("sm_ckpt").toString
    val q = StreamIngest.start(spark, staging.toString, out, state, ckpt)
    try {
      // SAME game-month (2024-03) published as two separate files at
      // different times: under plain year_month dynamic overwrite the
      // second batch would silently REPLACE the first one's rows.
      // Published hidden-temp + rename (Acquire-style): the stream is
      // LIVE, and a trigger firing between create and write would list
      // a half-written visible file into the offset log
      Files.writeString(staging.resolve(".a.tmp"),
        gameTxt(1, "2024.03.05") + "\n" + gameTxt(2, "2024.03.10"))
      Files.move(staging.resolve(".a.tmp"), staging.resolve("a.pgn"))
      q.processAllAvailable()
      Files.writeString(staging.resolve(".b.tmp"),
        gameTxt(3, "2024.03.15") + "\n" + gameTxt(4, "2024.03.20"))
      Files.move(staging.resolve(".b.tmp"), staging.resolve("b.pgn"))
      q.processAllAvailable()
    } finally q.stop()
    val all = spark.read.parquet(out)
    assert(all.count() === 8) // all 4 games x 2 roles survived
    assert(all.select("year_month").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("2024_03"))
    // counters ran across the two batches of the one month
    val lastCum = all.filter(col("Player") === "alice")
      .agg(max(col("Player_cum_games_total"))).head().getInt(0)
    assert(lastCum === 4)
  }

  test("replaying a committed batch is a no-op (crash between state commit and offset commit)") {
    val out = Files.createTempDirectory("si_replay_out").toString
    val state = Files.createTempDirectory("si_replay_state").toString
    val pgnDir = Files.createTempDirectory("si_replay_pgn")
    Files.writeString(pgnDir.resolve("m.pgn"),
      gameTxt(1, "2024.03.05") + "\n" + gameTxt(2, "2024.03.10"))
    val raw = spark.read.format("pgn").load(pgnDir.toString)

    StreamIngest.applyBatch(spark, raw, 0L, out, state,
      ChessPipeline.MovesMode.Omitted)
    val once = rows(out)
    val stateOnce = Files.list(Paths.get(state)).toArray.mkString(",")
    assert(once.length === 4)

    // the replay foreachBatch would issue after a crash that lost the
    // offset commit but kept the state commit: same batch id again
    StreamIngest.applyBatch(spark, raw, 0L, out, state,
      ChessPipeline.MovesMode.Omitted)
    assert(rows(out) === once) // sink unchanged
    assert(Files.list(Paths.get(state)).toArray.mkString(",") === stateOnce)
    // a NEW batch id still applies (the marker is a high-water mark,
    // not a latch): counters double-apply would show as cum 3/4 here
    StreamIngest.applyBatch(spark, raw, 1L, out, state,
      ChessPipeline.MovesMode.Omitted)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cur = StateSwap.resolve(fs, state).get
    val n = spark.read.parquet(cur.toString)
      .filter(col("name") === "alice").agg(sum(col("n_games"))).head().getLong(0)
    assert(n === 4) // 2 games applied twice under DIFFERENT batch ids
  }
}
