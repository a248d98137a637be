package graft.chess

import java.nio.file.Files

/** A15 crash-restart integration (round-9 verdict item, the chess
  * twin of StreamCrashRestartSpec): simulate the crash window where
  * `applyBatch` ran to completion — sink written, state committed
  * WITH the applied-id marker — but the streaming offset commit never
  * happened, then RESTART the real stream on the same checkpoint.
  * The restarted stream re-offers the batch under the same id and the
  * applied-id guard must skip it: output row-identical to a
  * never-interrupted twin run.
  */
class StreamIngestCrashSpec extends graft.SparkSpec {

  private def gameTxt(i: Int, date: String): String =
    PgnFixtures.gameTxt(i, date, time = s"10:0${i % 10}:00", sitePrefix = "cr")

  private def rowsOf(dir: String): Seq[Seq[String]] =
    spark.read.parquet(dir).collect()
      .map(_.toSeq.map(String.valueOf).toSeq).toSeq.sortBy(_.mkString("|"))

  test("crash after state commit before offset commit: restart skips the replay") {
    def run(interrupted: Boolean): Seq[Seq[String]] = {
      val staging = Files.createTempDirectory("a15c_staging")
      val out = Files.createTempDirectory("a15c_out").toString
      val state = Files.createTempDirectory("a15c_state").toString
      val ckpt = Files.createTempDirectory("a15c_ckpt").toString
      Files.writeString(staging.resolve(".m1.tmp"), gameTxt(1, "2024.03.05"))
      Files.move(staging.resolve(".m1.tmp"), staging.resolve("m1.pgn"))
      val q0 = StreamIngest.start(spark, staging.toString, out, state, ckpt)
      try q0.processAllAvailable() finally q0.stop()
      Files.writeString(staging.resolve(".m2.tmp"), gameTxt(2, "2024.04.02"))
      Files.move(staging.resolve(".m2.tmp"), staging.resolve("m2.pgn"))
      if (interrupted) {
        val batch = spark.read.format("pgn")
          .load(staging.resolve("m2.pgn").toString)
        StreamIngest.applyBatch(spark, batch, 1L, out, state,
          ChessPipeline.MovesMode.Omitted)
      }
      val q1 = StreamIngest.start(spark, staging.toString, out, state, ckpt)
      try q1.processAllAvailable() finally q1.stop()
      rowsOf(out)
    }

    val outI = run(interrupted = true)
    val outU = run(interrupted = false)
    assert(outI.nonEmpty, "no rows ingested")
    assert(outI === outU, "ingest output diverged after crash-restart")
  }
}
