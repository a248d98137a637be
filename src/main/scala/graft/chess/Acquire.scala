package graft.chess

import java.io.InputStream
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Acquisition layer — the reference's download step re-expressed as
  * fetch-to-staging (ingest_lichess.py:9-27 + ingester.py:88-124).
  *
  * The reference streams the HTTP body straight into the single-
  * threaded parser; here the dump is staged as a `.pgn.zst` first and
  * then read by the split-aware distributed PGN source — at 100 TB
  * the download is the serial part, so it is decoupled from the
  * (parallel) parse instead of feeding it. Monthly dumps land as
  * `<staging>/lichess_db_standard_rated_YYYY-MM.pgn.zst`; an existing
  * complete file short-circuits (the reference's "exists. Skipping"
  * check, ingest_lichess.py:24-26), and downloads go through a
  * hidden `.inprogress` temp + rename so a crashed fetch never leaves
  * a truncated file that a later run would trust.
  *
  * The staging directory goes through Hadoop [[FileSystem]] — the
  * seam the reference threads an `s3fs.core.S3FileSystem` through
  * (ingester.py:71-81, 415-424) — so `--staging s3a://bucket/dumps`
  * or `hdfs://...` work exactly like a local path (which resolves to
  * `file:`/RawLocalFileSystem). Crash-safety is carried by the HIDDEN
  * temp, not by rename atomicity: the PGN planner (batch and
  * streaming) prunes dot-prefixed names at every level, so even on an
  * object store where rename is copy+delete a reader can never
  * observe a partial download — the worst crash outcome is a missing
  * dest plus an invisible stale temp.
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

  /** Hadoop configuration for the staging filesystem: the active
    * Spark session's (so `spark.hadoop.fs.s3a.*` credentials etc.
    * apply to the fetch exactly as they do to the sink), or a plain
    * default outside a session.
    */
  private def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Fetch `url` into `stagingDir/fileName` unless it already exists;
    * returns the staged path (qualified against the staging
    * filesystem). Streams to a hidden per-process temp and renames
    * only on success.
    */
  def fetch(url: String, stagingDir: String, fileName: String): Path = {
    val dir = new Path(stagingDir)
    val fs: FileSystem = dir.getFileSystem(hadoopConf())
    fs.mkdirs(dir)
    val dest = new Path(dir, fileName)
    if (fs.exists(dest)) return fs.makeQualified(dest) // complete by construction
    // temp name unique PER PROCESS: two overlapping fetches of the
    // same month (scheduler retry racing a slow first attempt) must
    // not interleave writes into one shared temp, or the rename could
    // publish a corrupt file that the exists-check trusts forever.
    // DOT-PREFIXED: the PGN planner (batch and streaming) prunes
    // hidden names at every level, so a scan or stream tailing the
    // staging dir can never discover a partially-downloaded temp —
    // the invisibility contract PgnMicroBatchStream documents.
    val tmp = new Path(dir, "." + fileName + ".inprogress." +
      java.util.UUID.randomUUID().toString)
    val conn = new URI(url).toURL.openConnection()
    conn.setConnectTimeout(ConnectTimeoutMs)
    conn.setReadTimeout(ReadTimeoutMs)
    val in: InputStream = conn.getInputStream
    try {
      val out = fs.create(tmp, true)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally { out.close(); in.close() }
      // publish: rename is atomic on HDFS/posix; on object stores it
      // degrades to copy+delete, which is still safe here (see object
      // doc — the temp is invisible, dest appears only complete). A
      // false return with dest present = a concurrent winner already
      // published the same complete payload; trust it.
      if (!fs.rename(tmp, dest) && !fs.exists(dest))
        throw new java.io.IOException(s"rename $tmp -> $dest failed")
    } finally if (fs.exists(tmp)) fs.delete(tmp, false)
    fs.makeQualified(dest)
  }

  /** Stage year/month's monthly dump (the ingest_lichess entry shape:
    * give me a month, I give you a staged `.pgn.zst`). `baseUrl`
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
