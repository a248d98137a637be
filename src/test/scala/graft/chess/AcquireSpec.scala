package graft.chess

import java.nio.file.{Files, Paths}

/** Acquisition layer: URL scheme parity with the reference, atomic
  * staging, idempotent skip, and the give-me-a-month ingest end to
  * end. Driven over `file://` mirrors — this environment has no
  * network egress, and the transport is the same JDK stream either
  * way.
  */
class AcquireSpec extends graft.SparkSpec {

  test("monthly dump URL matches the reference's scheme") {
    // ingester.py:89-90
    assert(Acquire.monthlyDumpUrl(2024, 3) ===
      "https://database.lichess.org/standard/lichess_db_standard_rated_2024-03.pgn.zst")
    assert(Acquire.monthlyDumpName(2013, 11) ===
      "lichess_db_standard_rated_2013-11.pgn.zst")
  }

  test("fetchMonth stages from a file:// mirror, then skips when present") {
    // build a local "mirror" holding a zstd month dump
    val mirror = Files.createTempDirectory("lichess_mirror")
    val name = Acquire.monthlyDumpName(2024, 1)
    val payload = {
      val src = Files.readAllBytes(
        Paths.get(SamplePgn.ensureWritten(), "games_00.pgn"))
      val bos = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos)
      z.write(src); z.close()
      bos.toByteArray
    }
    Files.write(mirror.resolve(name), payload)

    val staging = Files.createTempDirectory("graft_staging").toString
    val staged = Acquire.fetchMonth(2024, 1, staging,
      baseUrl = Some(mirror.toUri.toString))
    assert(staged.getFileName.toString === name)
    assert(Files.readAllBytes(staged).toSeq === payload.toSeq)
    // no leftover temp, and a second fetch short-circuits (mtime
    // unchanged even though the mirror could have been deleted)
    assert(!Files.exists(staged.resolveSibling(name + ".inprogress")))
    val mtime = Files.getLastModifiedTime(staged)
    Files.delete(mirror.resolve(name))
    val again = Acquire.fetchMonth(2024, 1, staging,
      baseUrl = Some(mirror.toUri.toString))
    assert(again === staged)
    assert(Files.getLastModifiedTime(staged) === mtime)
  }

  test("--month ingest runs end to end from a file:// mirror") {
    // mirror holding March 2024 as a zstd dump of 50 sample games
    val mirror = Files.createTempDirectory("lichess_mirror_e2e")
    val name = Acquire.monthlyDumpName(2024, 3)
    val src = Files.readAllBytes(
      Paths.get(SamplePgn.ensureWritten(), "games_01.pgn"))
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(src); z.close()
    Files.write(mirror.resolve(name), bos.toByteArray)

    val staging = Files.createTempDirectory("staging_e2e").toString
    val out = Files.createTempDirectory("ingest_e2e").toString
    IngestMain.run(spark, Array("--month=2024-03", out),
      stagingDir = staging, baseUrl = Some(mirror.toUri.toString))
    // staged file landed under the reference's name…
    assert(Files.exists(Paths.get(staging, name)))
    // …and the sink holds the doubled player-game-role rows,
    // month-partitioned
    val back = spark.read.parquet(out)
    assert(back.count() === 100) // 50 games x 2 roles
    assert(back.select("year_month").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("2024_01")) // sample UTCDate month
  }

  test("a failed fetch leaves no trusted file behind") {
    val staging = Files.createTempDirectory("graft_staging2").toString
    val missing = Files.createTempDirectory("empty_mirror")
    intercept[java.io.IOException] {
      Acquire.fetchMonth(2024, 2, staging, baseUrl = Some(missing.toUri.toString))
    }
    assert(!Files.exists(Paths.get(staging, Acquire.monthlyDumpName(2024, 2))))
  }
}
