package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D43 (pairwise source vocabulary overlap): hand-computed Jaccard on
  * a tiny corpus, completeness of the all-pairs frame (zero-overlap
  * pairs included), and set-algebra invariants on the test corpus.
  */
class SourceOverlapSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("sov").toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextOps.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
  }

  test("hand-computed pairs, including a zero-intersection pair") {
    // A: {x, y, z}  B: {y, q}  C: {m}
    val out = run(Seq(
      (1L, "A", "x y"), (2L, "A", "y z"),
      (3L, "B", "y q"), (4L, "C", "m")))
    val expected = Set(
      ("A", "B", 3L, 2L, 1L, 0.25), // 1 / (3 + 2 - 1)
      ("A", "C", 3L, 1L, 0L, 0.0),
      ("B", "C", 2L, 1L, 0L, 0.0))
    assert(out.toSet === expected)
  }

  test("duplicate tokens within and across docs count once per source") {
    val out = run(Seq(
      (1L, "A", "x x y"), (2L, "A", "x"), (3L, "B", "x")))
    assert(out.toSet === Set(("A", "B", 2L, 1L, 1L, 0.5)))
  }

  test("corpus invariants: all pairs present, inter <= min(v), jac in [0,1]") {
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.sourceOverlap(spark, dir).collect()
    val sources = graft.Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.length === sources * (sources - 1) / 2)
    out.foreach { r =>
      val (v1, v2, inter, jac) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(inter <= math.min(v1, v2))
      assert(jac >= 0.0 && jac <= 1.0)
      assert(r.getString(0) < r.getString(1))
    }
  }
}
