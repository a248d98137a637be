package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are generated from [[graft.ops.Registry]];
  * each operator module contributes `Q(name, fn, oracle)` entries so
  * the coverage checklist in SURVEY §2 maps 1:1 to code.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Q1-shaped aggregate: always 6 groups regardless of SF
    * (q5's region filter can collapse to 1 row at tiny SF).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
