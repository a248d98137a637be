package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D40 (normalization-canonical dedup): the CCNet normalize-then-dedup
  * semantics pinned on planted variants the raw-exact rule cannot
  * merge, plus conservation against the corpus.
  */
class NormalizedDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("normdedup").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.dedupNormalized(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("case/digit/punct/whitespace variants merge; raw variants counted") {
    val out = run(Seq(
      1L -> "Call 555-1234 now!",      // four raw-distinct spellings of
      2L -> "call 5551234 now",        // one canonical page (punct strip
      3L -> "CALL   555-1234 NOW",     // joins the digit runs)
      4L -> "call 0000000 now.",
      5L -> "a genuinely different page",
      6L -> "a genuinely different page")) // raw-exact dup: 1 variant
    assert(out.toSet === Set((1L, 4L, 4L), (5L, 2L, 1L)))
  }

  test("identity on already-canonical distinct texts") {
    val out = run(Seq(1L -> "alpha beta", 2L -> "gamma delta"))
    assert(out.toSet === Set((1L, 1L, 1L), (2L, 1L, 1L)))
  }

  test("corpus conservation: copies sum to doc count, variants <= copies") {
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.dedupNormalized(spark, dir).collect()
    val n = graft.Tables.load(spark, dir, "documents").count()
    assert(out.map(_.getLong(1)).sum === n)
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1)))
  }
}
