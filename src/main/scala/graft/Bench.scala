package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (SURVEY §6): runs the headline query set against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the
  * noop sink (count() would let Catalyst prune the expensive
  * projection work), and prints ONE JSON line.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing", "q3_shipping", "q5_volume", "q_top_users",
    "q_sessionize", "dedup_minhash", "ann_bruteforce", "text_quality",
    "cum_counts")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (parquet footer reads, codegen of a trivial
    // plan) so the first measured query doesn't pay session init.
    Tables.names.foreach(n =>
      if (n == "events") Tables.events(spark, sfDir).schema
      else Tables.load(spark, sfDir, n).schema)
    // Two runs per query, report the second: the first pays JIT +
    // janino codegen compilation (measured 3-6x inflation), which a
    // long-running cluster job pays once, not per-query.
    val results = headline.map { name =>
      try {
        def once(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once()
        name -> once()
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
