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
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      // typed-Aggregator plans (TopKAgg and friends) fall back to
      // SORT-BASED aggregation past 128 distinct keys per task by
      // default — the per-task candidate stream then gets fully
      // sorted, the exact cost the O(k)-state aggregators exist to
      // avoid (found by the r13 knnskew probe: the hot Voronoi task
      // sorted 2e8 rows). 128k keys x O(k) state is a few tens of MB.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "ERROR"))
    val totals = if (sys.env.contains("SPARK_GRAFT_METRICS")) {
      val t = new ShuffleTotals; spark.sparkContext.addSparkListener(t); Some(t)
    } else None
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
