package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D55/D56/D57 — UniMax allocation, per-source corpus diagnostics,
  * PMI collocations: closed-form answers on hand corpora plus the
  * family plan guards.
  */
class CorpusDiagSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // ---- D55 sample_unimax --------------------------------------------

  /** 3 languages with token masses 6 / 30 / 300 (every doc is 3 BPE
    * tokens, so the straddle rule is observable as a doc count).
    */
  private def unimaxDocs = {
    val mk = (lang: String, n: Int, off: Long) =>
      (0 until n).map(i => (off + i, lang, "alpha beta gamma"))
    (mk("aa", 2, 0L) ++ mk("bb", 10, 100L) ++ mk("cc", 100, 1000L))
      .toDF("doc_id", "lang", "text")
  }

  test("unimax waterfill: ascending order, epoch caps, remainder flow") {
    // budget=100, epochs=1, asc (6,aa),(30,bb),(300,cc):
    //   R=100 m=3 q=33 cap 6  -> aa gets 6,  R=94
    //   R=94  m=2 q=47 cap 30 -> bb gets 30, R=64
    //   R=64  m=1 q=64 cap300 -> cc gets 64
    // selection (3 tokens/doc): aa 2 docs, bb 10 docs, cc 22 docs
    // (21*3=63 < 64 keeps the straddling 22nd; 22*3=66 stops the 23rd)
    val sel = Sampling.sampleUnimaxOn(unimaxDocs, budget = 100L)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_toks").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sel("aa") === ((2L, 6L)))
    assert(sel("bb") === ((10L, 30L)))
    assert(sel("cc") === ((22L, 66L)))
  }

  test("unimax epoch cap scales the per-language ceiling") {
    // epochs=2 doubles every cap: aa min(33, 12)=12, bb min(47,60)=44,
    // cc min(R=100-12-44=44, 600)=44 — but a language can only
    // materialize its own corpus once, so aa still selects 2 docs
    val sel = Sampling.sampleUnimaxOn(unimaxDocs, budget = 100L, epochs = 2L)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sel("aa") === 2L)   // b_l=12 > t_l=6: everything, once
    assert(sel("bb") === 10L)  // b_l=44 > t_l=30: everything
    assert(sel("cc") === 15L)  // b_l=44: 14*3=42 < 44 keeps doc 15
  }

  test("unimax conservation: allocations never exceed the budget") {
    for (budget <- Seq(0L, 7L, 100L, 1000L)) {
      val picked = Sampling.sampleUnimaxOn(unimaxDocs, budget = budget)
      // cum_before < b_l per lang and per-lang prefix is contiguous,
      // so Σ selected tokens <= Σ b_l + straddle slack (< one doc per
      // lang); the hard invariant is Σ min(b_l, t_l) <= budget, which
      // the selection can only undershoot plus the straddle
      val tok = picked.agg(coalesce(sum("n_toks"), lit(0L)))
        .collect()(0).getLong(0)
      assert(tok <= budget + 3 * 3, s"budget=$budget selected=$tok")
    }
    assert(Sampling.sampleUnimaxOn(unimaxDocs, budget = 0L).count() === 0L)
  }

  // ---- D56 text_zipf -------------------------------------------------

  test("zipf diagnostics: closed-form fit, ttr, hapax on a hand corpus") {
    val docs = Seq((1L, "s1", "a a a a b b b c c d"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.textZipfOn(docs).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 10L)
    assert(r.getAs[Long]("vocab") === 4L)
    assert(r.getAs[Double]("ttr") === 0.4)
    assert(r.getAs[Double]("hapax_ratio") === 0.25)
    // same fold arithmetic as the engine: x=ln(rank), y=ln(freq)
    val xs = (1 to 4).map(i => math.log(i.toDouble))
    val ys = Seq(4.0, 3.0, 2.0, 1.0).map(math.log)
    var (sx, sy, sxy, sxx) = (0.0, 0.0, 0.0, 0.0)
    for ((x, y) <- xs.zip(ys)) {
      sx += x; sy += y; sxy += x * y; sxx += x * x
    }
    val expected = BigDecimal((4.0 * sxy - sx * sy) / (4.0 * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("zipf_slope") === expected)
  }

  test("zipf fit restricts to the top-k ranks") {
    val docs = Seq((1L, "s1", "a a a a b b b c c d"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.textZipfOn(docs, k = 2).collect()(0)
    // two points: slope = (y2-y1)/(x2-x1) exactly
    val expected = BigDecimal(
      (math.log(3.0) - math.log(4.0)) / (math.log(2.0) - math.log(1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("zipf_slope") === expected)
    // the vocab stats stay corpus-wide, k only bounds the fit
    assert(r.getAs[Long]("vocab") === 4L)
  }

  test("text_zipf plan has no window (bounded TopKStrAgg, not rank)") {
    val plan = TextOps.textZipf(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in plan:\n$plan")
  }

  // ---- D57 text_pmi ---------------------------------------------------

  test("pmi collocations: closed-form score, min-count floor") {
    val docs = ((1 to 6).map(i => (i.toLong, "x y")) ++
      (7 to 9).map(i => (i.toLong, "x z"))).toDF("doc_id", "text")
    val top = TextOps.textPmiOn(docs).collect()
    // bigrams: (x,y)=6, (x,z)=3; minCount=5 keeps only (x,y)
    assert(top.length === 1)
    val r = top(0)
    assert((r.getAs[String]("x"), r.getAs[String]("y")) === (("x", "y")))
    assert(r.getAs[Long]("c_xy") === 6L)
    // N=18, B=9: pmi = ln(6*18*18 / (9*9*6)) = ln 4
    val expected = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("pmi") === expected)
    // floor at 1 admits the rare pair too
    val all = TextOps.textPmiOn(docs, minCount = 1L)
    assert(all.count() === 2L)
  }

  test("pmi bigrams never span documents") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "text")
    assert(TextOps.textPmiOn(docs, minCount = 1L).count() === 0L)
  }

  test("text_pmi plan has no window (TakeOrdered top-k, narrow bigrams)") {
    val plan = TextOps.textPmi(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in plan:\n$plan")
  }
}
