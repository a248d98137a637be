package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D48 (cross-source duplicate leakage): hand-computed pair counts on
  * a tiny corpus (including a zero-overlap pair and null texts),
  * distinct-text semantics (copies inside one source count once), and
  * structural invariants on the test corpus.
  */
class SourceLeakageSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("slk").toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.dedupSourceLeakage(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
  }

  test("hand-computed pairs, zero-overlap preserved, copies count once") {
    // A: {t1, t2}  B: {t1}  C: {t3}; t1 appears twice inside A —
    // distinct texts only, so A∩B shares ONE group
    val out = run(Seq(
      (1L, "A", "t1"), (2L, "A", "t1"), (3L, "A", "t2"),
      (4L, "B", "t1"), (5L, "C", "t3")))
    val expected = Set(
      ("A", "B", 1L, 2L, 1L, 0.5), // 1 / (2 + 1 - 1)
      ("A", "C", 0L, 2L, 1L, 0.0),
      ("B", "C", 0L, 1L, 1L, 0.0))
    assert(out.toSet === expected)
  }

  test("null texts collapse to one shared group") {
    val out = run(Seq(
      (1L, "A", null), (2L, "B", null), (3L, "B", "x")))
    assert(out.toSet === Set(("A", "B", 1L, 1L, 2L, 0.5)))
  }

  test("corpus invariants: all pairs, shared <= min, jaccard in [0,1]") {
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.dedupSourceLeakage(spark, dir).collect()
    val sources = graft.Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.length === sources * (sources - 1) / 2)
    out.foreach { r =>
      val (shared, ga, gb, jac) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(shared <= math.min(ga, gb))
      assert(jac >= 0.0 && jac <= 1.0)
    }
  }

  test("plan has no window (partial-agg collapse + catalog-sized pairs)") {
    val plan = Dedup.dedupSourceLeakage(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in plan:\n$plan")
  }
}
