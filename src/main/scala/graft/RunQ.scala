package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries from SparkEntry against a sf dir.
  * Usage: runMain graft.RunQ <sfDir> name1 name2 ...  ("explain" flag
  * via SPARK_GRAFT_EXPLAIN=1)
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "ERROR"))
    for (name <- args.tail) {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
        // noop sink: forces full materialization of every column
        // (count() would let Catalyst prune the expensive projections).
        df.write.format("noop").mode("overwrite").save()
        println(f"[runq] $name: materialized in ${(System.nanoTime() - t0) / 1e9}%.1fs")
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
