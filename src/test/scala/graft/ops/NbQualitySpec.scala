package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract pins for D50 (`text_quality_classifier`, the GPT-3-style
  * one-pass Naive-Bayes quality filter): closed-form add-one-smoothed
  * scores on a hand-computed corpus (both keep classes populated),
  * multiplicity-weighted collapse of exact copies, the empty-document
  * prior-only path, and the no-window plan guard.
  */
class NbQualitySpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("nb_docs").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("closed-form scores: prior + summed likelihood odds, both classes") {
    // curated = {good}: docs 1, 5, 6; crawl: 2, 3 (exact COPY of doc
    // 1's text), 4 (empty). Multiplicity-weighted counts:
    //   aa: ct=1 cr=2   bb: ct=1 cr=1   cc: ct=0 cr=1
    //   xx: ct=3 cr=0   yy: ct=3 cr=0
    // V=5, Nt=8, Nr=4; dc=3, dr=3 -> prior = ln(4) - ln(4) = 0.
    val dir = writeDocs(Seq(
      (1L, "aa bb", "good"), (2L, "aa cc", "crawl"),
      (3L, "aa bb", "crawl"), (4L, "", "crawl"),
      (5L, "xx yy xx yy", "good"), (6L, "xx yy", "good")))
    val lw = Map(
      "aa" -> (math.log(2.0 / 13) - math.log(3.0 / 9)),
      "bb" -> (math.log(2.0 / 13) - math.log(2.0 / 9)),
      "cc" -> (math.log(1.0 / 13) - math.log(2.0 / 9)),
      "xx" -> (math.log(4.0 / 13) - math.log(1.0 / 9)),
      "yy" -> (math.log(4.0 / 13) - math.log(1.0 / 9)))
    def score(toks: String*): Double = r6(0.0 + toks.map(lw).sum)

    val rows = TextOps.textNbQuality(spark, dir, curated = Seq("good"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Double]("nb_score"),
          r.getAs[Boolean]("keep")))).toMap

    assert(rows.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(rows(1L) === ((2L, score("aa", "bb"), score("aa", "bb") > 0)))
    assert(rows(3L) === rows(1L)) // the exact copy scores identically
    assert(rows(2L) === ((2L, score("aa", "cc"), false)))
    assert(rows(5L) === ((4L, score("xx", "yy", "xx", "yy"), true)))
    assert(rows(6L) === ((2L, score("xx", "yy"), true)))
    // crawl-flavored and curated-flavored docs land on opposite sides
    assert(!rows(2L)._3 && rows(5L)._3)
  }

  test("empty document: n_toks = 0, score = the prior alone") {
    // dc=1, dr=2 -> prior = ln(2) - ln(3); the empty doc has no
    // likelihood evidence at all
    val dir = writeDocs(Seq(
      (1L, "aa", "good"), (2L, "aa", "crawl"), (3L, "", "crawl")))
    val row = TextOps.textNbQuality(spark, dir, curated = Seq("good"))
      .filter(col("doc_id") === 3L).collect().head
    assert(row.getAs[Long]("n_toks") === 0L)
    assert(row.getAs[Double]("nb_score") ===
      r6(math.log(2.0) - math.log(3.0)))
    assert(!row.getAs[Boolean]("keep"))
  }

  test("heldout: frozen history model + priors, OOV smoothing floor") {
    // history: doc 1 "aa bb" (good), doc 2 "aa cc" (crawl) ->
    //   aa ct=1 cr=1, bb ct=1 cr=0, cc ct=0 cr=1; V=3, Nt=2, Nr=2;
    //   dc=1, dr=1 -> prior = ln(2) - ln(2) = 0.
    // batch: doc 11 carries OOV token zz (floor weight 0 here since
    // Nt+V == Nr+V), doc 12 is crawl-flavored.
    val dir = writeDocs(Seq(
      (1L, "aa bb", "good"), (2L, "aa cc", "crawl"),
      (11L, "aa bb zz", "crawl"), (12L, "cc cc", "good")))
    val lwAa = 0.0 // ln(2/5) - ln(2/5)
    val lwBb = math.log(2.0 / 5) - math.log(1.0 / 5)
    val lwCc = math.log(1.0 / 5) - math.log(2.0 / 5)
    val lwZz = 0.0 // OOV: ln(1/5) - ln(1/5)
    val rows = TextOps.textNbQualityHeldout(spark, dir,
        splitId = 10L, curated = Seq("good")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Double]("nb_score"),
          r.getAs[Boolean]("keep")))).toMap
    assert(rows.keySet === Set(11L, 12L)) // history rows are not scored
    assert(rows(11L) === ((3L, r6(0.0 + lwAa + lwBb + lwZz), true)))
    assert(rows(12L) === ((2L, r6(0.0 + lwCc + lwCc), false)))
  }

  test("plan has no window") {
    val plan = TextOps.textNbQuality(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in plan:\n$plan")
  }
}
