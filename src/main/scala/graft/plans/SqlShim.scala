package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.storage.StorageLevel

/** The one compilation unit that lives in Spark's package namespace, to
  * reach two `private[sql]` seams the public API does not expose. Kept
  * deliberately tiny: everything above it goes through
  * [[graft.Lineage]].
  *
  * Why it exists: `Dataset.localCheckpoint` truncates BOTH the plan
  * lineage (good — iterative loops like connected components and BPE
  * re-analyze a flat LogicalRDD instead of an ever-deeper tree) AND
  * the RDD lineage (bad — the materialized blocks become the only copy
  * of the data, so `RDD.unpersist` on them logs the Spark-4 "lineage
  * has been truncated and cannot be recomputed" warning, an executor
  * loss kills the job, and a deliberate free (graft's per-iteration
  * checkpoint hygiene) looks like a footgun to every log reader).
  * What the loops actually need is only the PLAN cut. This shim builds
  * exactly that: materialize the query into a persisted
  * `RDD[InternalRow]` that KEEPS its full lineage, and wrap it in a
  * fresh `LogicalRDD`-backed frame. Unpersist is then safe by
  * construction (blocks recompute from the parquet sources on the
  * rare re-read), warning-free, and executor loss degrades to
  * recompute instead of failure.
  */
object GraftSqlShim {

  /** Plan-lineage-only checkpoint: persist + materialize the frame's
    * internal RDD (rows copied first — Tungsten reuses `UnsafeRow`
    * buffers per partition, the same reason `Dataset.checkpoint` maps
    * `_.copy()`), then re-enter the SQL layer through a LogicalRDD.
    * Storage level matches `localCheckpoint`'s MEMORY_AND_DISK.
    */
  def persistCut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val rdd = df.queryExecution.toRdd
      .map((r: InternalRow) => r.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager, like localCheckpoint(eager = true)
    spark.internalCreateDataFrame(rdd, df.schema)
  }

  /** Drain the listener bus — stage-metric listeners (RunQ's shuffle
    * totals) receive events asynchronously, so a reader must flush
    * before totalling. `listenerBus` is `private[spark]`.
    */
  def flushListeners(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Whether `rdd`'s persisted blocks are a `localCheckpoint` — i.e.
    * the ONLY copy of the data (RDD lineage truncated): unpersisting
    * such blocks destroys them instead of degrading to recompute.
    * [[graft.Caches.scoped]] must skip these. `isLocallyCheckpointed`
    * is `private[rdd]` (narrower than this package), but Scala access
    * qualifiers erase to a public JVM method — one cached reflective
    * handle reaches it without adding a compilation unit to
    * `org.apache.spark.rdd`.
    */
  private lazy val isLocalCkpt =
    classOf[org.apache.spark.rdd.RDD[_]].getMethod("isLocallyCheckpointed")
  def isLocallyCheckpointed(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
    isLocalCkpt.invoke(rdd).asInstanceOf[Boolean]
}
