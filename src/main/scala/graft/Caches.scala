package graft

import org.apache.spark.sql.SparkSession

/** Session-cache hygiene for the long-running mains.
  *
  * Several operators `localCheckpoint()` intermediate frames (corpus
  * builds, signature tables, offset levels) — correct per query, but
  * the blocks stay pinned until the SparkContext stops, so a session
  * that runs MANY queries (Verify's full dump, Bench's 4 samples per
  * entry, a notebook) accumulates dead blocks: the round-5
  * dedup_clusters bench drift (4.3→6.1s monotone across warm runs)
  * was exactly this, inside one query's loop. The in-query fix frees
  * what a query can prove dead; this sweep is the BETWEEN-queries
  * complement — once a query's result is fully materialized, nothing
  * re-reads its checkpoints (the next run rebuilds its plan from
  * scratch), so dropping every persisted RDD is safe there and keeps
  * executor memory flat no matter how many queries one session runs.
  */
object Caches {

  /** Drop every persisted RDD block in the session. Only call at a
    * quiescent point (no job running, no returned DataFrame still to
    * be consumed): a `cache()` frame recomputes if re-read, but a
    * `localCheckpoint` frame CANNOT — its lineage is truncated.
    */
  def sweep(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
