package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D36 duplicate-span removal: planted-corpus semantics (cross-doc
  * spans, within-doc repeats, exact-copy policy, short docs) and the
  * no-window plan guard.
  */
class RemoveDupSpansSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("rds_planted").toString
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta x1 y1 z1"),
      (2L, "p2 q2 alpha beta gamma delta w2"),
      // exact copies whose content appears nowhere else: the sharing
      // rule counts UNIQUE texts, so their spans must survive
      (3L, "cat dog emu fox gnu"),
      (4L, "cat dog emu fox gnu"),
      // within-doc repeat of "r s t"
      (5L, "r s t u r s t v"),
      // shorter than one gram
      (6L, "one two"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted spans: cross-doc removed, unique-copy content kept") {
    val out = TextOps.textRemoveDupSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 1/2 share "alpha beta gamma delta" => two shared 3-grams
    // covering those four tokens in each
    assert(out(1L) === ((7L, 4L, "x1 y1 z1")))
    assert(out(2L) === ((7L, 4L, "p2 q2 w2")))
    // exact copies: one unique text, spans not self-counted
    assert(out(3L) === ((5L, 0L, "cat dog emu fox gnu")))
    assert(out(4L) === ((5L, 0L, "cat dog emu fox gnu")))
    // within-doc repeat: both occurrences of "r s t" excised
    assert(out(5L) === ((8L, 6L, "u v")))
    // sub-gram-length doc untouched
    assert(out(6L) === ((2L, 0L, "one two")))
  }

  test("no window anywhere in the plan (collapse-riding query)") {
    val plan = TextOps.textRemoveDupSpans(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"), plan)
  }
}
