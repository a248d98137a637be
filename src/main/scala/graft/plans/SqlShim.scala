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
    *
    * The LogicalRDD is built through [[execution.LogicalRDD.fromDataset]]
    * — the same seam `Dataset.checkpoint` uses — so the materialized
    * frame KEEPS the executed plan's output partitioning (plain-hash
    * form only, see below) and constraints (attribute ids rewritten to
    * the new frame's output; `map` is per-partition, so the copied
    * rows stay exactly where the plan left them). The earlier
    * `internalCreateDataFrame` wrapper
    * reported UnknownPartitioning, which made EnsureRequirements
    * re-shuffle every cut frame at its next keyed consumer — in the
    * iterative operators (PageRank's 10 rounds, the CC alternating-
    * star loop, the BPE/unigram train loops, k-means) that was one
    * avoidable full exchange of the loop state per round, paid on
    * frames this shim had JUST materialized hash-partitioned on the
    * very key the next round joins on (guide §2.4: remove shuffles
    * outright — two operations keyed the same way share one exchange).
    *
    * The ESTIMATED statistics fromDataset would also carry are
    * deliberately REBUILT AWAY (r16, measured): with real-looking
    * sizeInBytes on a cut frame the STATIC planner starts making join
    * strategy calls from propagated estimates — at sf0.1 it flipped
    * knn_graph's engineered candidate join to a static broadcast-hash
    * join (stage CPU 1.5 → 7.1 s, bench CPU 3.7 → 11.6 s) that the
    * runtime-size-driven AQE path had correctly NOT chosen. Same
    * doctrine as the 64m adaptive-threshold change: runtime sizes are
    * trustworthy, static estimates are not — so a cut frame reports
    * the default (effectively infinite) size and every join strategy
    * decision over it stays with AQE's measured exchange sizes.
    */
  def persistCut(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap, Expression, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val rdd = df.queryExecution.toRdd
      .map((r: InternalRow) => r.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager, like localCheckpoint(eager = true) — and for
                // an adaptive plan this finalizes every query stage,
                // so the partitioning read below is the FINAL one
    // fromDataset supplies the constraint machinery; partitioning and
    // ordering are read from the final physical root OURSELVES because
    // AdaptiveSparkPlanExec (a LeafExecNode wrapper) reports
    // UnknownPartitioning/Nil — fromDataset sees through nothing and
    // the preservation would silently never fire on AQE plans (i.e.
    // on every production cut; measured: the LineageSpec pin fails on
    // the unwrapped-less form)
    val lr = execution.LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    val physical = df.queryExecution.executedPlan match {
      case a: execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // map the physical root's attribute ids onto the new frame's
    // output (positional — same schema by construction); an attr the
    // map misses keeps its id and, being absent from the output, makes
    // the claimed property inert for `satisfies` rather than wrong
    val attrs = AttributeMap(physical.output.zip(lr.output))
    def rw(e: Expression): Expression =
      e.transform { case a: Attribute => attrs.getOrElse(a, a) }
    @scala.annotation.tailrec
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case pc: PartitioningCollection => firstLeaf(pc.partitionings.head)
      case other => other
    }
    // Claim ONLY a plain HashPartitioning (and pass non-Expression
    // partitionings — SinglePartition/Unknown — through). Measured
    // r16: carrying CoalescedHashPartitioning (an AQE-coalesced read's
    // shape) on a LogicalRDD breaks CacheManager's canonical-plan
    // matching — `.cache()`d frames derived from such a cut silently
    // stopped resolving to their InMemoryRelation (PlanSpec's
    // heldout-perplexity pin caught it: every shared token frame
    // re-computed instead of reading the cache). Exotic partitionings
    // and output ordering are therefore dropped to Unknown/Nil — the
    // aggregation-consumer exchange elision (LineageSpec pin) only
    // needs the plain hash form, which is what a user-keyed
    // `repartition(n, k)` root (never AQE-coalesced) produces.
    val part = firstLeaf(physical.outputPartitioning) match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        rw(h).asInstanceOf[Partitioning]
      case e: Expression =>
        org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(
          rdd.getNumPartitions)
      case o => o
    }
    val ordering: Seq[SortOrder] = Nil
    // rebuild WITHOUT the estimated stats (None → computeStats falls
    // back to defaultSizeInBytes, the pre-r16 static-planner behavior)
    classic.Dataset.ofRows(spark,
      execution.LogicalRDD(lr.output, lr.rdd, part, ordering,
        lr.isStreaming, None)(spark, None, Some(lr.constraints)))
  }

  /** Drain the listener bus — stage-metric listeners (RunQ's shuffle
    * totals) receive events asynchronously, so a reader must flush
    * before totalling. `listenerBus` is `private[spark]`.
    */
  def flushListeners(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Sum a named SQL metric across every plan node of every SQL
    * execution whose id is > `sinceExecId`, returning (newest execution
    * id seen, summed value). The SQL status store is `private[sql]`;
    * this is the instrument behind RunQ's `SPARK_GRAFT_SQLMETRIC` —
    * e.g. "sort fallback" reads ObjectHashAggregate's "number of sort
    * fallback tasks" counter, turning a does-the-partial-agg-degrade
    * hypothesis into a counter instead of a wall-clock inference.
    *
    * Values arrive display-formatted: plain SUM counters as "1,234";
    * size metrics as "2.0 MiB (min, med, max)"; timing metrics as
    * "1.5 m (...)". The leading total is parsed as a DECIMAL and
    * NORMALIZED by its unit suffix — sizes to bytes, durations to ms —
    * so sums never mix "2.0 MiB" as 2 with "512.0 KiB" as 512 (that
    * unit-blind mix was a real r13 hazard, flagged in review). One
    * nameSubstring targets one metric family, so the normalized sum is
    * dimensionally consistent per call.
    */
  def sqlMetricSince(spark: SparkSession, sinceExecId: Long,
      nameSubstring: String): (Long, Long) = {
    val store = spark.asInstanceOf[classic.SparkSession].sharedState.statusStore
    val execs = store.executionsList().filter(_.executionId > sinceExecId)
    // leading total: decimal number (comma-grouped) + optional unit token
    val num = "(-?\\d[\\d,]*(?:\\.\\d+)?)\\s*([A-Za-z]+)?".r
    val unitScale: Map[String, Double] = Map(
      "B" -> 1d, "KiB" -> math.pow(2, 10), "MiB" -> math.pow(2, 20),
      "GiB" -> math.pow(2, 30), "TiB" -> math.pow(2, 40),
      "PiB" -> math.pow(2, 50), "EiB" -> math.pow(2, 60),
      // Utils.msDurationToString suffixes, normalized to ms
      "ms" -> 1d, "s" -> 1000d, "m" -> 60000d, "h" -> 3600000d)
    val total = execs.map { e =>
      val vals = store.executionMetrics(e.executionId)
      e.metrics.filter(_.name.contains(nameSubstring))
        .flatMap(m => vals.get(m.accumulatorId))
        .flatMap(v => num.findFirstMatchIn(v))
        .map { m =>
          val raw = m.group(1).replace(",", "").toDouble
          val scale = Option(m.group(2)).flatMap(unitScale.get).getOrElse(1d)
          (raw * scale).toLong
        }.sum
    }.sum
    val maxId = (sinceExecId +: execs.map(_.executionId)).max
    (maxId, total)
  }

  /** Per-plan-node metric dump for every SQL execution newer than
    * `sinceExecId`: one line per node that has populated metrics, in
    * the display format ("node HashAggregate#12: output rows=1,234,
    * spill size=2.0 MiB"). The instrument behind RunQ's
    * `SPARK_GRAFT_PLANMETRICS` — where [[sqlMetricSince]] answers "how
    * much total", this answers "WHICH operator": the r14 residual
    * attributions (knn_graph candidate volume, bpe_encode growth) need
    * per-node output-row counts, not a summed scalar.
    */
  def planMetricLinesSince(spark: SparkSession, sinceExecId: Long)
      : (Long, Seq[String]) = {
    val store = spark.asInstanceOf[classic.SparkSession].sharedState.statusStore
    val execs = store.executionsList().filter(_.executionId > sinceExecId)
    val lines = execs.flatMap { e =>
      val vals = store.executionMetrics(e.executionId)
      store.planGraph(e.executionId).allNodes.flatMap { n =>
        // size/timing metrics render MULTILINE ("total (min, med, max)"
        // header, values on the next line) — flatten, or a line-based
        // log filter silently drops the values
        val ms = n.metrics.flatMap(m =>
          vals.get(m.accumulatorId).map(v =>
            s"${m.name}=${v.replace("\n", " ")}"))
        if (ms.isEmpty) None
        else Some(s"exec ${e.executionId} ${n.name}#${n.id}: ${ms.mkString(" | ")}")
      }
    }
    val maxId = (sinceExecId +: execs.map(_.executionId)).max
    (maxId, lines)
  }

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
