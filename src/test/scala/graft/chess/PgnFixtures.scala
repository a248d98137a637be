package graft.chess

import java.nio.file.{Files, Path}

/** Shared PGN test fixtures: the canonical synthetic tag block and the
  * zstd monthly-dump encoding. One definition — a tag-schema change (a
  * new required tag, a renamed field) edits here, not in every spec
  * that hand-rolled its own copy.
  */
object PgnFixtures {

  /** One rated-blitz game: alice (White, 1500) beats bob (Black,
    * 1400). `sitePrefix` keeps game IDs distinct across specs.
    */
  def gameTxt(i: Int, date: String, time: String = "10:00:00",
      sitePrefix: String = "g"): String =
    s"""[Event "Rated Blitz game"]
       |[Site "https://lichess.org/$sitePrefix$i"]
       |[White "alice"]
       |[Black "bob"]
       |[Result "1-0"]
       |[UTCDate "$date"]
       |[UTCTime "$time"]
       |[WhiteElo "1500"]
       |[BlackElo "1400"]
       |[ECO "A00"]
       |[Opening "Polish Opening"]
       |[TimeControl "300+0"]
       |[Termination "Normal"]
       |
       |1. e4 e5 1-0
       |""".stripMargin

  /** zstd-encode bytes (the monthly-dump transport encoding). */
  def zstd(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(bytes); z.close()
    bos.toByteArray
  }

  /** Publish a month dump into a `file://` mirror dir under
    * [[Acquire]]'s naming scheme.
    */
  def writeDump(mirror: Path, year: Int, month: Int, body: Array[Byte]): Unit =
    Files.write(mirror.resolve(Acquire.monthlyDumpName(year, month)), zstd(body))
}
