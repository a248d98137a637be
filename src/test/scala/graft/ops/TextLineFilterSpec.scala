package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D29 contract pins for `text_line_filter` (C4 line rules: terminal
  * punctuation + ≥3 words per line; ≥3 surviving lines per doc).
  */
class TextLineFilterSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("linefilter_docs").toString
    Seq(
      // 4 good sentences + boilerplate: menu stubs, an unpunctuated
      // line, a short exclamation -> kept 4, keep = true
      (1L, Seq(
        "This is a proper sentence with plenty of words.",
        "Home", "About us", "Cookies!",
        "Another full sentence ends with a question mark?",
        "this line has many words but no terminal punctuation",
        "And a third good sentence appears right here!",
        "A fourth complete sentence closes the page.").mkString("\n")),
      // 2 good lines only -> keep = false (three-sentence rule)
      (2L, "One good sentence right here.\nNav\nA second good one, yes it is.\nFooter"),
      // no newlines, one long good sentence -> 1 line, 1 kept, false
      (3L, "A single line document that does end with a period."),
      // nothing survives
      (4L, "Buy now\nSign in\nMenu")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("line rules and the three-line document verdict, hand-computed") {
    val rows = TextOps.textLineFilter(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4))))
      .toMap
    val (n1, k1, t1, keep1) = rows(1L)
    assert((n1, k1, keep1) === ((8L, 4L, true)))
    assert(t1 === Seq(
      "This is a proper sentence with plenty of words.",
      "Another full sentence ends with a question mark?",
      "And a third good sentence appears right here!",
      "A fourth complete sentence closes the page.").mkString("\n"))
    assert(rows(2L) === ((4L, 2L,
      "One good sentence right here.\nA second good one, yes it is.", false)))
    assert(rows(3L) === ((1L, 1L,
      "A single line document that does end with a period.", false)))
    assert(rows(4L) === ((3L, 0L, "", false)))
  }
}
