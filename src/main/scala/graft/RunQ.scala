package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries from SparkEntry against a sf dir.
  * Usage: runMain graft.RunQ <sfDir> name1 name2 ...  ("explain" flag
  * via SPARK_GRAFT_EXPLAIN=1, per-query shuffle totals via
  * SPARK_GRAFT_METRICS=1 — the instrument behind SURVEY §8's
  * shuffle-bytes before/after records)
  */
object RunQ {

  /** Accumulates stage-level shuffle bytes; reset per query. */
  private class ShuffleTotals extends SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong()
    val written = new java.util.concurrent.atomic.AtomicLong()
    override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
      val m = st.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { read.set(0L); written.set(0L) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    // dev knobs: core count (default 8 — the quick-iteration shape) and
    // arbitrary conf overrides "k=v;k=v" for A/B plan probes (the
    // instrument behind §8's AQE-partition-sizing measurements)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).filter(_.contains('='))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // typed-Aggregator plans (TopKAgg and friends) fall back to
      // SORT-BASED aggregation past 128 distinct keys per task by
      // default — the per-task candidate stream then gets fully
      // sorted, the exact cost the O(k)-state aggregators exist to
      // avoid (found by the r13 knnskew probe: the hot Voronoi task
      // sorted 2e8 rows). 128k keys x O(k) state is a few tens of MB.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      // shuffles START wide and let AQE coalesce down (parallelismFirst
      // keeps small exchanges at full parallelism): with the fixed
      // 32-partition default, sf100's 600M-row sort-merge sides ran
      // ~2 GB/partition and spilled — q5_volume measured 194 -> 147 s
      // (-25%) with wide initial partitions. On a real cluster this is
      // the knob that makes one session config survive 100x data drift.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 1024)
      // ...and let AQE coalesce CACHED plans too, or every .cache()
      // materializes all 1024 initial partitions and each downstream
      // pass schedules 1024 mostly-empty tasks (dedup_incremental_bloom
      // warm: 2.6 s wide-initials-only vs 0.7 s with this — the cached
      // history index is tiny but was pinned at the initial width).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "ERROR"))
    val totals = if (sys.env.contains("SPARK_GRAFT_METRICS")) {
      val t = new ShuffleTotals; spark.sparkContext.addSparkListener(t); Some(t)
    } else None
    // per-query sum of a named SQL metric over the query's executions
    // (substring match, e.g. "sort fallback", "spill size") — the
    // counter instrument behind §8's partial-agg-degradation probes
    val sqlMetric = sys.env.get("SPARK_GRAFT_SQLMETRIC")
    var lastExecId = -1L
    for (name <- args.tail) {
      val t0 = System.nanoTime()
      totals.foreach(_.reset())
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
        // noop sink: forces full materialization of every column
        // (count() would let Catalyst prune the expensive projections).
        df.write.format("noop").mode("overwrite").save()
        println(f"[runq] $name: materialized in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        totals.foreach { t =>
          // listener events drain asynchronously; flush before reading
          org.apache.spark.sql.GraftSqlShim.flushListeners(spark)
          println(f"[runq] $name shuffle: write ${t.written.get / 1048576.0}%.1f MiB, " +
            f"read ${t.read.get / 1048576.0}%.1f MiB")
        }
        sqlMetric.foreach { m =>
          org.apache.spark.sql.GraftSqlShim.flushListeners(spark)
          val (maxId, v) = org.apache.spark.sql.GraftSqlShim
            .sqlMetricSince(spark, lastExecId, m)
          lastExecId = maxId
          println(s"""[runq] $name sqlmetric "$m": $v""")
        }
        if (sys.env.contains("SPARK_GRAFT_SHOW")) df.show(5, 80)
      } catch { case e: Throwable =>
        println(s"[runq] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        e.getStackTrace.take(10).foreach(f => println(s"   at $f"))
        Option(e.getCause).foreach(c =>
          println(s"   cause: ${c.getClass.getName}: ${c.getMessage}"))
      // failed or not, the query's checkpoints are dead post-attempt
      } finally Caches.sweep(spark)
    }
    spark.stop()
  }
}
