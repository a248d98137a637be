package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan instrument for the [[Lineage.cut]] seam (round 16).
  *
  * The iterative operators' per-round plans never appear in a
  * registered query's final `explain` — each round is cut (executed
  * eagerly) during query CONSTRUCTION, so the final frame's plan
  * starts at a LogicalRDD. This probe runs a named registered query
  * with [[Lineage.probePlans]] on and prints the physical plan of
  * EVERY frame the cut materialized — i.e. exactly the per-round
  * loop plans. It is the before/after evidence instrument for the
  * r16 `persistCut` change (LogicalRDD built via
  * `LogicalRDD.fromDataset`, preserving output partitioning): with
  * partitioning preserved, a round's join of two cut frames keyed the
  * way they were materialized shows NO Exchange on those inputs;
  * with the old UnknownPartitioning wrapper every round re-shuffled
  * them.
  *
  * Usage: runMain graft.CutProbe <sfDir> [queryName]  (default
  * pagerank — 10 power-iteration rounds, the heaviest loop rider)
  */
object CutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val name = args.lift(1).getOrElse("pagerank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toIntOption.getOrElse(8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", 1024)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "ERROR"))
    Lineage.probePlans = true
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      import scala.jdk.CollectionConverters._
      val plans = Lineage.planProbe.asScala.toSeq
      println(s"[cutprobe] $name: ${plans.size} cut frames")
      plans.zipWithIndex.foreach { case (p, i) =>
        println(s"[cutprobe] === cut $i ===")
        println(p)
      }
    } finally {
      Lineage.probePlans = false
      Lineage.planProbe.clear()
      Caches.sweep(spark)
      spark.stop()
    }
  }
}
