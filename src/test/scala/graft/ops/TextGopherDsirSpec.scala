package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract pins for D33 (`text_gopher`, the Gopher/MassiveText A1.1
  * quality rules) and D34 (`text_dsir`, DSIR unigram importance
  * scoring) on hand-computed corpora — each rule violated by exactly
  * one planted document, and the DSIR weights re-derived from the
  * closed-form add-one-smoothed ratios.
  */
class TextGopherDsirSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("gopher_docs").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("gopher rules: each planted violation fails exactly its rule") {
    // 60 words, all alphabetic, mean length in [3,10], contains
    // 'the'/'and'/'with'/'that' -> passes every rule
    val good = Seq.fill(5)(
      "the quick brown fox jumps right over that lazy dog and friend.")
      .mkString(" ") + " with ease indeed."
    val dir = writeDocs(Seq(
      (1L, good, "en"),
      // bullet-led lines: 10/10 >= 90% -> bullet rule fails
      (2L, (1 to 10).map(i => s"- item number $i listed").mkString("\n"), "en"),
      // '#' + '...' symbols: 8 symbols on ~62 words > 0.1 -> symbol rule
      (3L, good + " #tag #tag #tag #tag wait... wait... wait... wait...", "en"),
      // 2 of 3 lines end in ellipsis -> ellipsis-line rule fails
      (4L, "First line trails off...\nSecond line also trails...\nBut not this one.", "en"),
      // numeric tokens: 4 alpha of 60 words < 80% -> alpha rule fails
      (5L, (1 to 56).map(i => s"$i${i * 31}").mkString(" ") +
        " four alpha words here", "en"),
      // mean word length > 10 -> word-length rule fails
      (6L, Seq.fill(55)("extraordinarily incomprehensibilities").mkString(" "), "en")))
    val rows = TextOps.textGopher(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(rows(1L).getAs[Boolean]("keep"))
    assert(rows(1L).getAs[Long]("n_words") === 63L)
    assert(rows(1L).getAs[Long]("stop_hits") >= 2L)
    val mwl = rows(1L).getAs[Double]("mean_word_len")
    assert(mwl >= 3.0 && mwl <= 10.0)

    assert(!rows(2L).getAs[Boolean]("keep"))
    assert(rows(2L).getAs[Long]("n_bullet") === 10L)
    assert(rows(2L).getAs[Long]("n_lines") === 10L)

    assert(!rows(3L).getAs[Boolean]("keep"))
    assert(rows(3L).getAs[Long]("n_sym") === 8L)

    assert(!rows(4L).getAs[Boolean]("keep"))
    assert(rows(4L).getAs[Long]("n_ellipsis") === 2L)
    assert(rows(4L).getAs[Long]("n_lines") === 3L)

    assert(!rows(5L).getAs[Boolean]("keep"))
    assert(rows(5L).getAs[Long]("n_alpha") === 4L)
    assert(rows(5L).getAs[Long]("n_words") === 60L)

    assert(!rows(6L).getAs[Boolean]("keep"))
    assert(rows(6L).getAs[Double]("mean_word_len") > 10.0)
  }

  test("dsir: closed-form weights, multiplicity-weighted collapse") {
    // target (en): "aa bb"; raw (de): "aa cc" and an exact COPY of
    // doc 1's text -> the copy collapses to doc 1's rep but still
    // counts toward the raw LM (multiplicity weighting).
    val dir = writeDocs(Seq(
      (1L, "aa bb", "en"), (2L, "aa cc", "de"), (3L, "aa bb", "de")))
    // counts: aa ct=1 cr=2, bb ct=1 cr=1, cc ct=0 cr=1; V=3 Nt=2 Nr=4
    val lwAa = math.log(2.0 / 5) - math.log(3.0 / 7)
    val lwBb = math.log(2.0 / 5) - math.log(2.0 / 7)
    val lwCc = math.log(1.0 / 5) - math.log(2.0 / 7)
    val rows = TextOps.textDsir(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Double]("dsir_score"),
          r.getAs[Boolean]("keep")))).toMap
    assert(rows(1L) === ((2L, r6((lwAa + lwBb) / 2), true)))
    assert(rows(3L) === rows(1L)) // the exact copy scores identically
    assert(rows(2L) === ((2L, r6((lwAa + lwCc) / 2), false)))
  }

  test("dsir heldout: frozen history LMs, OOV smoothing floor") {
    // history: doc 1 (en) "aa bb", doc 2 (de) "aa cc" -> counts
    // aa ct=1 cr=1, bb ct=1 cr=0, cc ct=0 cr=1; V=3, Nt=2, Nr=2.
    // batch: doc 11 has OOV token zz (floor weight 0 since Nt+V ==
    // Nr+V here), doc 12 is raw-flavored.
    val dir = writeDocs(Seq(
      (1L, "aa bb", "en"), (2L, "aa cc", "de"),
      (11L, "aa bb zz", "de"), (12L, "cc cc", "en")))
    val lwAa = 0.0 // ln(2/5) - ln(2/5)
    val lwBb = math.log(2.0 / 5) - math.log(1.0 / 5)
    val lwCc = math.log(1.0 / 5) - math.log(2.0 / 5)
    val lwZz = 0.0 // OOV: ln(1/5) - ln(1/5)
    val rows = TextOps.textDsirHeldout(spark, dir, splitId = 10L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Double]("dsir_score"),
          r.getAs[Boolean]("keep")))).toMap
    assert(rows.keySet === Set(11L, 12L)) // history rows are not scored
    assert(rows(11L) === ((3L, r6((lwAa + lwBb + lwZz) / 3), true)))
    assert(rows(12L) === ((2L, r6((lwCc + lwCc) / 2), false)))
  }
}
