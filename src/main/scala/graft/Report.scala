package graft

import org.apache.spark.sql.SparkSession

/** Plot-dataset export (the reference's last mile): `eda.ipynb`'s three
  * chart cells render daily game counts, high-Elo daily counts and the
  * top-opening distribution (img/gamecount.png, highcount.png,
  * openings.png). The engine deliverable ends at the DataFrame — this
  * main materializes exactly those three tables (the same oracle-pinned
  * queries behind `chess_daily_counts`, `chess_daily_high_elo`,
  * `chess_top_openings`) as single-file headered CSVs for whatever
  * plotting frontend the user points at them.
  *
  *   runMain graft.Report [outDir]
  */
object Report {
  val Datasets: Seq[String] =
    Seq("chess_daily_counts", "chess_daily_high_elo", "chess_top_openings")

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_report")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, outDir)
    spark.stop()
  }

  /** Writes one `<name>.csv/` per dataset; single file (these are
    * chart-sized aggregates — day counts and a top-5 — not data), with
    * header so the CSV is self-describing.
    */
  def run(spark: SparkSession, outDir: String): Unit =
    for (name <- Datasets) {
      SparkEntry.queries(name)(spark, outDir)
        .coalesce(1)
        .write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/$name.csv")
      System.err.println(s"[report] wrote $outDir/$name.csv")
    }
}
