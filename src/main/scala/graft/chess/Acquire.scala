package graft.chess

import java.io.InputStream
import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Acquisition layer — the reference's download step re-expressed as
  * fetch-to-staging (ingest_lichess.py:9-27 + ingester.py:88-124).
  *
  * The reference streams the HTTP body straight into the single-
  * threaded parser; here the dump is staged as a LOCAL `.pgn.zst`
  * first and then read by the split-aware distributed PGN source —
  * at 100 TB the download is the serial part, so it is decoupled from
  * the (parallel) parse instead of feeding it. Monthly dumps land as
  * `<staging>/lichess_db_standard_rated_YYYY-MM.pgn.zst`; an existing
  * complete file short-circuits (the reference's "exists. Skipping"
  * check, ingest_lichess.py:24-26), and downloads go through a
  * `.inprogress` temp + atomic rename so a crashed fetch never leaves
  * a truncated file that a later run would trust.
  *
  * Transport is a plain JDK URL stream: `https://` where the
  * environment allows, and `file://` for pre-mirrored dumps — which is
  * also what the spec drives, since this build environment has no
  * network egress (documented scope: the sandbox cannot reach
  * database.lichess.org; the URL construction and staging logic are
  * exactly the reference's).
  */
object Acquire {

  /** Transport timeouts: a stalled dump download must fail (and be
    * retried by the caller) rather than hang the ingest forever — a
    * raw `openStream()` has NO timeout and blocks indefinitely on a
    * half-open connection.
    */
  val ConnectTimeoutMs = 30000
  val ReadTimeoutMs = 120000

  /** The reference's URL scheme (ingester.py:89-90). */
  def monthlyDumpUrl(year: Int, month: Int): String =
    f"https://database.lichess.org/standard/${monthlyDumpName(year, month)}"

  def monthlyDumpName(year: Int, month: Int): String =
    f"lichess_db_standard_rated_$year%04d-$month%02d.pgn.zst"

  /** Fetch `url` into `stagingDir/fileName` unless it already exists;
    * returns the staged path. Atomic: streams to `fileName.inprogress`
    * and renames only on success.
    */
  def fetch(url: String, stagingDir: String, fileName: String): Path = {
    val dir = Paths.get(stagingDir)
    Files.createDirectories(dir)
    val dest = dir.resolve(fileName)
    if (Files.exists(dest)) return dest // complete by construction (atomic rename)
    // temp name unique PER PROCESS: two overlapping fetches of the
    // same month (scheduler retry racing a slow first attempt) must
    // not interleave writes into one shared temp, or the rename could
    // publish a corrupt file that the exists-check trusts forever.
    // DOT-PREFIXED: the PGN planner (batch and streaming) prunes
    // hidden names at every level, so a scan or stream tailing the
    // staging dir can never discover a partially-downloaded temp —
    // the invisibility contract PgnMicroBatchStream documents.
    val tmp = dir.resolve("." + fileName + ".inprogress." +
      java.util.UUID.randomUUID().toString)
    val conn = new URI(url).toURL.openConnection()
    conn.setConnectTimeout(ConnectTimeoutMs)
    conn.setReadTimeout(ReadTimeoutMs)
    val in: InputStream = conn.getInputStream
    try {
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      // ATOMIC_MOVE within one directory: either `dest` exists
      // complete or not at all (a concurrent winner's complete file
      // being replaced by ours — also complete — is harmless)
      Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
    dest
  }

  /** Stage year/month's monthly dump (the ingest_lichess entry shape:
    * give me a month, I give you a local `.pgn.zst`). `baseUrl`
    * overrides the lichess host for mirrors / `file://` trees.
    */
  def fetchMonth(year: Int, month: Int, stagingDir: String,
      baseUrl: Option[String] = None): Path = {
    val name = monthlyDumpName(year, month)
    val url = baseUrl match {
      case Some(b) => s"${b.stripSuffix("/")}/$name"
      case None => monthlyDumpUrl(year, month)
    }
    fetch(url, stagingDir, name)
  }
}
