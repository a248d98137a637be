package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.chess.SamplePgn
import graft.sources.pgn.streaming.PgnOffset

class PgnStreamSpec extends SparkSpec {

  test("streaming pgn source picks up newly arriving files, ignores hidden staging") {
    val dir = Files.createTempDirectory("pgn_stream")
    val src = SamplePgn.ensureWritten() // 4 files x 50 games
    Files.copy(Paths.get(src, "games_00.pgn"), dir.resolve("m1.pgn"))
    val stream = spark.readStream.format("pgn").load(dir.toString)
      .select(element_at(col("tags"), "Site").as("site"))
    val q = stream.writeStream.format("memory")
      .queryName("pgn_stream_t").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("pgn_stream_t").count() === 50)
      // a new dump lands: only it is read in the next batch
      Files.copy(Paths.get(src, "games_01.pgn"), dir.resolve("m2.pgn"))
      q.processAllAvailable()
      assert(spark.table("pgn_stream_t").count() === 100)
      // a file being staged (hidden name, Acquire-style) is invisible…
      Files.copy(Paths.get(src, "games_02.pgn"), dir.resolve("_m3.staging"))
      q.processAllAvailable()
      assert(spark.table("pgn_stream_t").count() === 100)
      // …until atomically renamed into place
      Files.move(dir.resolve("_m3.staging"), dir.resolve("m3.pgn"))
      q.processAllAvailable()
      assert(spark.table("pgn_stream_t").count() === 150)
      // no duplicates: every site id is unique across the three dumps
      assert(spark.table("pgn_stream_t").select("site").distinct().count() === 150)
    } finally q.stop()
  }

  test("a stream tailing the staging dir sees exactly what Acquire publishes") {
    // end-to-end over the REAL acquisition path: Acquire.fetchMonth
    // stages through its dot-prefixed temp + atomic rename into a dir
    // a stream is already tailing — the published .pgn.zst dump (and
    // nothing else: no temp, no partial rows) must arrive exactly once
    val staging = Files.createTempDirectory("acq_stream")
    val mirror = Files.createTempDirectory("acq_stream_mirror")
    val src = SamplePgn.ensureWritten()
    def dumpOf(file: String, year: Int, month: Int): Unit =
      graft.chess.PgnFixtures.writeDump(mirror, year, month,
        Files.readAllBytes(Paths.get(src, file)))
    dumpOf("games_00.pgn", 2024, 1)
    dumpOf("games_01.pgn", 2024, 2)

    val stream = spark.readStream.format("pgn").load(staging.toString)
      .select(element_at(col("tags"), "Site").as("site"))
    val q = stream.writeStream.format("memory")
      .queryName("acq_stream_t").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("acq_stream_t").count() === 0)
      graft.chess.Acquire.fetchMonth(2024, 1, staging.toString,
        baseUrl = Some(mirror.toUri.toString))
      q.processAllAvailable()
      assert(spark.table("acq_stream_t").count() === 50)
      graft.chess.Acquire.fetchMonth(2024, 2, staging.toString,
        baseUrl = Some(mirror.toUri.toString))
      q.processAllAvailable()
      assert(spark.table("acq_stream_t").count() === 100)
      // exactly once, all rows complete games
      assert(spark.table("acq_stream_t").select("site").distinct().count() === 100)
      assert(spark.table("acq_stream_t").filter(col("site").isNull).count() === 0)
    } finally q.stop()
  }

  test("restart recovers from the offset log: no reprocessing, new files picked up") {
    val dir = Files.createTempDirectory("pgn_stream_restart")
    val ckpt = Files.createTempDirectory("pgn_stream_ckpt").toString
    val out = Files.createTempDirectory("pgn_stream_out").toString
    val src = SamplePgn.ensureWritten()
    Files.copy(Paths.get(src, "games_00.pgn"), dir.resolve("m1.pgn"))
    def start() = spark.readStream.format("pgn").load(dir.toString)
      .select(element_at(col("tags"), "Site").as("site"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() === 50)
    // second incarnation resumes from the logged offset
    // (deserializeOffset path) and reads ONLY the new file
    Files.copy(Paths.get(src, "games_01.pgn"), dir.resolve("m2.pgn"))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val sites = spark.read.parquet(out).select("site")
      .collect().map(_.getString(0))
    assert(sites.length === 100)
    assert(sites.distinct.length === 100, "restart reprocessed already-committed files")
  }

  test("offset json round-trips, including quotes and backslashes in paths") {
    for (files <- Seq(Seq.empty[String], Seq("/a/b.pgn"),
        Seq("/odd\"name.pgn", "/back\\slash.pgn", "/plain.pgn"),
        Seq("/new\nline.pgn", "/tab\there.pgn", "/bell.pgn"))) {
      val json = PgnOffset(files).json()
      // the offset log is line-oriented: serialized form must never
      // contain a raw control character
      assert(!json.exists(_ < ' '), s"raw control char in: $json")
      assert(PgnOffset.fromJson(json) === PgnOffset(files))
    }
  }
}
