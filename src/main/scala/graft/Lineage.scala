package graft

import org.apache.spark.sql.DataFrame

/** Lineage control for the iterative / multi-consumer operators.
  *
  * Several operators materialize an intermediate frame because (a) two
  * or more subtrees consume it (signature tables, prefix postings) or
  * (b) a loop would otherwise re-analyze an ever-deeper plan each
  * round (connected components, BPE merges). [[cut]] is the one seam
  * they all go through, with two modes:
  *
  *  - **default** (no config): persist the materialized rows behind a
  *    fresh `LogicalRDD` ([[org.apache.spark.sql.GraftSqlShim]]). The
  *    PLAN lineage is truncated — exactly what the loops need — but
  *    the RDD keeps its lineage, so the blocks stay recomputable:
  *    [[free]]/[[Caches.sweep]] can drop them without Spark's
  *    "cannot be recomputed after unpersisting" warning, memory
  *    pressure evicts-and-recomputes instead of failing, and on a
  *    cluster an executor loss degrades to recompute. This replaced
  *    `localCheckpoint()` (whose truncated RDD lineage made every one
  *    of those a hazard) in round 7.
  *  - **`graft.checkpoint.dir` set** (session conf): reliable
  *    `Dataset.checkpoint()` into that directory. This is the
  *    multi-tenant-cluster mode for VERY long chains where even
  *    recompute-from-source is unacceptable (the checkpoint files
  *    survive any executor churn). Deployments pair it with
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` or
  *    periodic directory cleanup.
  */
object Lineage {

  /** Session conf key: when set (non-empty), [[cut]] uses reliable
    * `checkpoint()` into this directory instead of the persist-backed
    * default.
    */
  val ConfKey = "graft.checkpoint.dir"

  /** Test-only plan probe. A cut HIDES its upstream plan from every
    * consumer (they see a LogicalRDD), so a plan guard that inspects
    * only a query's final `executedPlan` cannot see, e.g., a
    * digest-keyed window buried inside a materialized collapse frame —
    * exactly the unsplittable-task anti-pattern CollapseSkewSpec pins
    * against. When [[probePlans]] is on, [[cut]] records the physical
    * plan of every frame it materializes; off (the default), the cost
    * is one volatile read.
    */
  private[graft] val planProbe =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile private[graft] var probePlans: Boolean = false

  /** Materialize `df` now and return a frame whose plan starts from
    * the materialized rows. See object doc for the two modes.
    */
  def cut(df: DataFrame): DataFrame = {
    if (probePlans) planProbe.add(df.queryExecution.executedPlan.toString)
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir creates a unique subdir per context; only
        // (re)point it when unset or pointed elsewhere by a prior run
        if (!sc.getCheckpointDir.exists(_.startsWith(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None =>
        org.apache.spark.sql.GraftSqlShim.persistCut(df)
    }
  }

  /** [[cut]] with the RDD lineage truncated too. The default [[cut]]
    * keeps RDD lineage (recomputable blocks — the safety property),
    * which means a VERY long iterative chain (hundreds of rounds)
    * accumulates an RDD DAG whose recursive task deserialization
    * eventually overflows the stack — measured: `Bpe.train` at ~300
    * merge rounds dies in `StackOverflowError` inside
    * `ObjectInputStream` (round 10, SURVEY §8). Loops beyond ~100
    * rounds route every [[Bpe.RddChainCap]]-th cut through here:
    * reliable `checkpoint()` when `graft.checkpoint.dir` is set (the
    * cluster deployment mode — files survive executor churn),
    * `localCheckpoint()` otherwise (blocks are not recomputable for
    * THIS frame — an accepted, bounded exposure paid once per cap
    * window, not per round).
    */
  def cutHard(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(ConfKey).exists(_.nonEmpty)) cut(df)
    else {
      if (probePlans) planProbe.add(df.queryExecution.executedPlan.toString)
      df.localCheckpoint()
    }
  }

  /** Drop a [[cut]] frame's persisted blocks. Safe whenever nothing
    * still NEEDS the materialization (the default mode recomputes on a
    * re-read; reliable mode re-reads its checkpoint files — there the
    * unpersist is a no-op). Matching on LogicalRDD finds the persisted
    * RDD regardless of mode.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
