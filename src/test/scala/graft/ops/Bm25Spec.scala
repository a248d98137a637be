package graft.ops

import graft.SparkSpec

/** Hand-computed BM25 fixture (the independent check the DuckDB oracle
  * cannot provide: the oracle transcribes the same formula, so a shared
  * misderivation — wrong idf variant, avgdl over the wrong doc set —
  * would pass both engines. These expectations were derived by hand,
  * longhand decimal arithmetic, NOT by running either engine).
  *
  * Corpus: 4 docs, N = 4, Σdl = 3+2+4+3 = 12, avgdl = 3.0,
  * k1 = 1.2, b = 0.75.
  *
  * Query 0 = "apple banana": df(apple) = 2 (docs 0,1),
  * df(banana) = 2 (docs 0,2) → idf = round(ln((4−2+0.5)/(2+0.5)+1), 6)
  * = round(ln 2, 6) = 0.693147 for both terms.
  *   doc 0 (dl=3, lenNorm = 1−b+b·3/3 = 1.0):
  *     apple  tf=2: 0.693147·(2·2.2)/(2+1.2·1.0) = 0.693147·1.375
  *                  = 0.953077125
  *     banana tf=1: 0.693147·2.2/(1+1.2) = 0.693147
  *     score = 1.646224125 → 1.646224
  *   doc 2 (dl=4, lenNorm = 1.25):
  *     banana tf=3: 0.693147·6.6/(3+1.5) = 0.693147·22/15
  *                  = 1.0166156 → 1.016616
  *   doc 1 (dl=2, lenNorm = 0.75):
  *     apple  tf=1: 0.693147·2.2/(1+0.9) = 0.693147·22/19
  *                  = 0.8025912632 → 0.802591
  *   doc 3 shares no term with the query → NOT scored (BM25 candidates
  *   are docs containing ≥1 query term; absent, not zero).
  *
  * Query 1 = "fig": df = 1 → idf = round(ln((4−1+0.5)/1.5+1), 6)
  * = round(ln(10/3), 6) = 1.203973;
  *   doc 3 (dl=3): 1.203973·2.2/(1+1.2) = 1.203973.
  */
class Bm25Spec extends SparkSpec {
  private lazy val corpus = {
    import spark.implicits._
    Seq(
      0L -> "apple banana apple",
      1L -> "apple cherry",
      2L -> "banana banana banana cherry",
      3L -> "date elderberry fig").toDF("doc_id", "text")
  }

  test("textBm25On matches a hand-computed fixture (scores, ranks, candidate set)") {
    val out = TextOps.textBm25On(spark, corpus,
        Seq(0L -> "apple banana", 1L -> "fig"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0L, 1L, 0L, 1.646224),
      (0L, 2L, 2L, 1.016616),
      (0L, 3L, 1L, 0.802591),
      (1L, 1L, 3L, 1.203973)))
  }

  test("k truncates ranked lists per query, not globally") {
    val out = TextOps.textBm25On(spark, corpus,
        Seq(0L -> "apple banana", 1L -> "fig"), k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // query 0 keeps its top 2 of 3 candidates; query 1's single
    // candidate is untouched
    assert(out.toSeq === Seq((0L, 1L, 0L), (0L, 2L, 2L), (1L, 1L, 3L)))
  }

  test("repeated query terms do not double-count (distinct before scoring)") {
    val once = TextOps.textBm25On(spark, corpus, Seq(0L -> "fig"), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    val twice = TextOps.textBm25On(spark, corpus, Seq(0L -> "fig fig"), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(once.toSeq === Seq(3L -> 1.203973))
    assert(twice.toSeq === once.toSeq)
  }

  test("all-empty query set returns an empty result, not an exception") {
    // every query tokenizes to zero terms → the fixed term set is
    // empty; TermTfs can't be built over it, so the op must
    // short-circuit (round-8 advice: the isin formulation returned
    // empty gracefully, the fused one threw)
    val out = TextOps.textBm25On(spark, corpus,
      Seq(0L -> "", 1L -> " \t "), k = 5)
    assert(out.columns.toSeq === Seq("query_id", "rk", "doc_id", "score"))
    assert(out.count() === 0L)
  }
}
