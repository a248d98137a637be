package graft.ops

import graft.SparkSpec

/** D41 (span-corruption objective materialization): the strongest
  * possible pin is the T5 round trip — splicing each sentinel's target
  * span back into the input at the sentinel's position must reproduce
  * the original token stream exactly, for every document. Plus mask
  * accounting, rate sanity and the degenerate rows.
  */
class SpanCorruptSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sentinelOrd(tok: String): Option[Int] =
    if (tok.startsWith("<extra_id_") && tok.endsWith(">"))
      Some(tok.stripPrefix("<extra_id_").stripSuffix(">").toInt)
    else None

  test("round trip: input with targets spliced back == original tokens") {
    val rows = TextOps.textSpanCorrupt(spark, dir).collect()
    assert(rows.nonEmpty)
    val original = graft.Tables.load(spark, dir, "documents").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    var maskedTotal = 0L
    var tokensTotal = 0L
    for (r <- rows) {
      val (id, nTok, nMask, nSpans) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val input = r.getString(4).split(" ").filter(_.nonEmpty).toSeq
      val target = r.getString(5).split(" ").filter(_.nonEmpty).toSeq
      // parse target into span -> tokens
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      for (t <- target) sentinelOrd(t) match {
        case Some(k) => cur = k; spans(k) = Vector.empty
        case None    => spans(cur) = spans(cur) :+ t
      }
      assert(spans.keySet === (0 until nSpans.toInt).toSet, s"doc $id spans")
      // every span drops at least one token (runs are non-empty)
      assert(spans.values.forall(_.nonEmpty), s"doc $id empty span")
      val rebuilt = input.flatMap(t => sentinelOrd(t) match {
        case Some(k) => spans(k)
        case None    => Seq(t)
      })
      assert(rebuilt === original(id), s"doc $id round trip")
      assert(nTok === original(id).size.toLong, s"doc $id n_tokens")
      assert(nMask === spans.values.map(_.size).sum.toLong, s"doc $id n_masked")
      maskedTotal += nMask; tokensTotal += nTok
    }
    // rate sanity: thr="0d" (13/256) with 3-token spans masks
    // 1-(243/256)^3 ~ 14.5% in expectation — allow a generous band
    val rate = maskedTotal.toDouble / tokensTotal
    assert(rate > 0.05 && rate < 0.30, f"mask rate $rate%.3f out of band")
  }

  test("degenerate docs: empty text and all-clean rows are well-formed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir2 = java.nio.file.Files.createTempDirectory("spancorr").toString
    Seq(1L -> "", 2L -> "one").toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val rows = TextOps.textSpanCorrupt(spark, dir2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(rows(1L)._1 === 0L && rows(1L)._2 === 0L && rows(1L)._4 === "")
    val (n2, m2, s2, in2, tg2) = rows(2L)
    assert(n2 === 1L)
    if (m2 === 0L) { assert(in2 === "one" && tg2 === "" && s2 === 0L) }
    else { assert(in2 === "<extra_id_0>" && tg2 === "<extra_id_0> one") }
  }

  test("determinism: two runs produce identical frames") {
    val a = TextOps.textSpanCorrupt(spark, dir).collect().toSeq
    val b = TextOps.textSpanCorrupt(spark, dir).collect().toSeq
    assert(a === b)
  }
}
