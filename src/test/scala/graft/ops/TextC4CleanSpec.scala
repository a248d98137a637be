package graft.ops

import graft.SparkSpec

/** Hand-built pages for the full C4 §2.2 pipeline (D29b): the DuckDB
  * oracle transcribes the same rules, so the crafted corpus pins the
  * SEMANTICS independently — which lines survive, which pages die,
  * and exactly which sentences the cross-page span dedup removes.
  */
class TextC4CleanSpec extends SparkSpec {

  private def run(pages: Seq[(Long, String)]) = {
    import spark.implicits._
    TextOps.textC4CleanOn(pages.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  private val boiler =
    "alpha beta gamma one.\ndelta epsilon zeta two.\neta theta iota three."

  test("cross-page repeated span: first occurrence kept, later ones stripped") {
    val out = run(Seq(
      1L -> (boiler + "\nunique closing line one here."),
      2L -> (boiler + "\nunique closing line two here."),
      3L -> "totally unrelated first sentence here.\nanother unrelated sentence follows now.\nfinal unrelated sentence ends this."))
    // doc 1 wins the boiler span (smallest doc_id): all 4 lines stay
    assert(out(1L) === ((4L, 4L, 0L,
      boiler + "\nunique closing line one here.")))
    // doc 2: sentences 1-3 are the non-first occurrence -> dropped;
    // its unique line survives
    assert(out(2L) === ((4L, 4L, 3L, "unique closing line two here.")))
    // doc 3 shares nothing
    assert(out(3L) === ((3L, 3L, 0L,
      "totally unrelated first sentence here.\nanother unrelated sentence follows now.\nfinal unrelated sentence ends this.")))
  }

  test("within-page repeated span: the second occurrence is stripped too") {
    val out = run(Seq(
      7L -> (boiler + "\nbridge sentence sits between blocks.\n" + boiler)))
    // 7 sentences; spans at pos 5..7 repeat the pos-1 span (and the
    // pos-2/3 spans roll over the bridge, unique). Non-first
    // occurrence covers sentences 5,6,7 -> dropped.
    assert(out(7L) === ((7L, 7L, 3L,
      boiler + "\nbridge sentence sits between blocks.")))
  }

  test("page rules: lorem ipsum, curly brace and short pages die; line rules filter") {
    val out = run(Seq(
      1L -> "good first sentence right here.\nLorem Ipsum appears in this one.\ngood third sentence right here.",
      2L -> "good first sentence right here.\nfunction f() { return 0; }\ngood third sentence right here.",
      3L -> "only two proper sentences here.\nso the page must die now.",
      4L -> "menu.\nnav\nthis real sentence survives fine.\nno terminal punctuation on this line\nsecond real sentence survives fine!\nthird real sentence survives fine?"))
    assert(!out.contains(1L), "lorem ipsum page must die (case-insensitive)")
    assert(!out.contains(2L), "curly-brace page must die")
    assert(!out.contains(3L), "sub-minLines page must die")
    // doc 4: 6 raw lines; 'menu.' (<3 words), 'nav' and the
    // unpunctuated line are filtered; 3 survive -> page lives
    assert(out(4L) === ((6L, 3L, 0L,
      "this real sentence survives fine.\nsecond real sentence survives fine!\nthird real sentence survives fine?")))
  }
}
