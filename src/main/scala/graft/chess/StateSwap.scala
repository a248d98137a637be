package graft.chess

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe commit protocol for the resumable ingestion state
  * (the Spark analog of the reference's cumulative-file swap,
  * ingest_lichess.py / ingester.py:60-86).
  *
  * Layout under the state dir: `player_state` (committed),
  * `player_state_old` (retired copy, exists only mid-swap or after a
  * crash), `player_state_next` (staging, written by the job).
  *
  * Invariant: at EVERY instant at least one of `player_state` /
  * `player_state_old` holds the last committed state, and
  * [[resolve]] prefers the newer one — so a crash at any point in
  * [[commit]] loses nothing and the next run resumes correctly.
  */
object StateSwap {
  val Cur = "player_state"
  val Old = "player_state_old"
  val Next = "player_state_next"

  /** Applied-work marker: the ids of work units (stream batch ids,
    * range month indexes) already folded into a state copy's
    * counters, stored as a newline-separated `_applied` file INSIDE
    * the copy — underscore-prefixed so parquet readers ignore it, and
    * committed ATOMICALLY with the counters it describes by the same
    * directory swap. Re-applying an id in the set would double-count
    * its games, so ingest drivers check it before applying and carry
    * it forward on every commit. Id spaces are driver-local (stream
    * batch ids vs month indexes): one driver owns a state dir.
    */
  val Applied = "_applied"

  def appliedIds(fs: FileSystem, stateCopy: Path): Set[Long] = {
    val p = new Path(stateCopy, Applied)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSet
      finally in.close()
    }
  }

  def writeApplied(fs: FileSystem, stateCopy: Path, ids: Set[Long]): Unit = {
    val out = fs.create(new Path(stateCopy, Applied), true)
    try out.write(ids.toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The last committed state, if any: `cur` normally; `old` if a
    * crash hit between the retire and the final rename.
    *
    * A `cur` missing Spark's `_SUCCESS` marker while `old` exists is
    * treated as incomplete and `old` wins — a mitigation for
    * filesystems whose directory rename is copy+delete (object
    * stores), where a crash mid-promote can leave a partial `cur`.
    * The protocol's hard guarantee still assumes atomic directory
    * rename (HDFS / local / posix); on an object store, front the
    * state dir with an HDFS/ABFS-style path or a manifest committer.
    */
  def resolve(fs: FileSystem, dir: String): Option[Path] = {
    val cur = new Path(dir, Cur)
    val old = new Path(dir, Old)
    val curComplete = fs.exists(new Path(cur, "_SUCCESS"))
    if (fs.exists(cur) && (curComplete || !fs.exists(old))) Some(cur)
    else if (fs.exists(old)) Some(old)
    else None
  }

  /** Promotes an already-written `player_state_next` to committed.
    * Three steps: retire cur -> old (only when cur exists — after a
    * crash recovery `old` may be the ONLY committed copy and must not
    * be touched), rename next -> cur, drop old. Hadoop rename returns
    * false instead of throwing on most filesystems, so every rename
    * is checked — a silently failed swap followed by the cleanup
    * delete would destroy the last committed state.
    */
  def commit(fs: FileSystem, dir: String): Unit = {
    val cur = new Path(dir, Cur)
    val old = new Path(dir, Old)
    val next = new Path(dir, Next)
    require(fs.exists(next), s"nothing staged at $next")
    def mustRename(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"state swap failed: $from -> $to")
    if (fs.exists(cur)) {
      fs.delete(old, true) // stale retiree from a completed run
      mustRename(cur, old)
    }
    mustRename(next, cur)
    fs.delete(old, true) // committed; drop the retired copy
  }
}
