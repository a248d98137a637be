package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE trainer semantics (SURVEY §2.D22) on hand-computable corpora:
  * the merge sequence, greedy rewrite, and weighted pair counts.
  */
class BpeSpec extends SparkSpec {

  /** One-doc corpus whose word frequencies are exactly `words`. */
  private def corpus(words: (String, Int)*): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("bpe_spec").toString
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    Seq(Doc(1, text, "en", "s", text.length))
      .toDF().write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("bpe train reproduces the classic newest/widest merge sequence") {
    // Sennrich et al. 2016 §3.2's worked example (plus 'low'/'lower'):
    // (e,s), then (es,t), then (est,</w>) — all count 9, found in
    // that order under the (cnt desc, p1, p2) tie-break
    val d = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val (merges, vocab) = Bpe.train(spark, d, 3)
    assert(merges === Seq(Bpe.Merge("e", "s", 9),
      Bpe.Merge("es", "t", 9), Bpe.Merge("est", "</w>", 9)))
    val syms = vocab.filter(col("word") === "newest")
      .select("sym").collect()(0).getSeq[String](0)
    assert(syms === Seq("n", "e", "w", "est</w>"))
    vocab.unpersist()
  }

  test("bpe merge rewrite is greedy left-to-right on overlapping pairs") {
    // "aaa" under merge (a,a): greedy gives [aa, a], never [a, aa];
    // the merged symbol must not cascade-merge with the next token
    // within the same round
    val d = corpus("aaa" -> 1)
    val (merges, vocab) = Bpe.train(spark, d, 2)
    assert(merges === Seq(Bpe.Merge("a", "a", 2), Bpe.Merge("a", "</w>", 1)))
    val syms = vocab.select("sym").collect()(0).getSeq[String](0)
    assert(syms === Seq("aa", "a</w>"))
    vocab.unpersist()
  }

  test("bpe_pairs counts pair occurrences weighted by word frequency") {
    val d = corpus("ab" -> 3, "ba" -> 2)
    val rows = Bpe.bpePairs(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    // "ab" x3 -> (a,b):3 (b,</w>):3; "ba" x2 -> (b,a):2 (a,</w>):2;
    // output in (cnt desc, p1, p2) order
    assert(rows.toSeq === Seq(("a", "b", 3L), ("b", "</w>", 3L),
      ("a", "</w>", 2L), ("b", "a", 2L)))
  }

  test("bpe train stops early when no pairs remain") {
    // single-char word: syms [x, </w>] -> one pair, then nothing
    val d = corpus("x" -> 4)
    val (merges, vocab) = Bpe.train(spark, d, 5)
    assert(merges === Seq(Bpe.Merge("x", "</w>", 4)))
    assert(vocab.select("sym").collect()(0).getSeq[String](0) === Seq("x</w>"))
    vocab.unpersist()
  }
}
