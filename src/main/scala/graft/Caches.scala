package graft

import org.apache.spark.sql.SparkSession

/** Session-cache hygiene for the long-running mains.
  *
  * Operators `cache()` shared frames and [[Lineage.cut]] multi-consumer
  * intermediates — correct per query, but a session that runs MANY
  * queries (Verify's full dump, Bench's 4 samples per entry, a
  * notebook) accumulates dead blocks: the round-5 dedup_clusters bench
  * drift (4.3→6.1s monotone across warm runs) was exactly this, inside
  * one query's loop. The in-query fix frees what a query can prove
  * dead; this sweep is the BETWEEN-queries complement — once a query's
  * result is fully materialized, nothing re-reads its
  * materializations (the next run rebuilds its plan from scratch), so
  * dropping everything is safe there and keeps executor memory flat no
  * matter how many queries one session runs.
  */
object Caches {

  /** Drop every cached plan and persisted RDD block in the session.
    * Call at a quiescent point (no job running, no returned DataFrame
    * still to be consumed).
    *
    * Two layers, both mandatory:
    *  - `catalog.clearCache()` removes `cache()` entries from the
    *    CacheManager TOGETHER with their blocks. Unpersisting the
    *    blocks alone (the round-6 sweep) left the plan entries behind,
    *    so the next run's structurally-identical `.cache()` hit the
    *    stale entry — the repeated "Asked to cache already cached
    *    data" warnings in BENCH_r06's tail, and a bench sample that
    *    silently re-used the registration instead of measuring its
    *    own build.
    *  - the RDD sweep drops what the CacheManager never knew about:
    *    [[Lineage.cut]] materializations (persisted RDDs behind
    *    LogicalRDDs). Since round 7 these keep their lineage, so the
    *    unpersist is safe-by-construction and warning-free (a
    *    `localCheckpoint` block would instead be unrecomputable, which
    *    Spark 4 loudly warns about — the other r6 bench-tail warning).
    */
  def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Scoped variant for the streaming `foreachBatch` appliers (round
    * 10, review finding): a micro-batch's pipeline makes several
    * [[Lineage.cut]] materializations INSIDE shared seams
    * (`newImagesAgainstHistory`'s reps/clean, `c4Surv`/`c4Spans`, …)
    * that the applier cannot reach to free — without this, a
    * long-running stream leaks 2-3 persisted frames per micro-batch
    * forever. Unpersists the RDDs persisted DURING `body`
    * (pre-existing user caches and other streams' blocks survive),
    * EXCEPT locally-checkpointed RDDs: a `localCheckpoint` block
    * ([[Lineage.cutHard]], e.g. a concurrent `Bpe.train` sharing the
    * session) is the ONLY copy of its data — unpersisting it would
    * fail that job, not recompute it. Everything else swept here is
    * recomputable by construction, so even a racing concurrent
    * stream only pays a recompute, never a failure.
    */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally spark.sparkContext.getPersistentRDDs
      .filter { case (id, rdd) => !before.contains(id) &&
        !org.apache.spark.sql.GraftSqlShim.isLocallyCheckpointed(rdd) }
      .values.foreach(_.unpersist(blocking = false))
  }
}
