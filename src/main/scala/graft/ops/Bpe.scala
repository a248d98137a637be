package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** D22: BPE tokenizer training — the pair-counting core (Sennrich et
  * al. 2016; GPT-2's byte-level variant counts the same statistic
  * over bytes). Training a tokenizer on a 100 TB corpus is itself a
  * large-scale data job, and its inner loop is exactly one Spark
  * aggregation: count adjacent symbol pairs over the DISTINCT word
  * shapes weighted by word frequency.
  *
  * Scale shape: the corpus collapses to its vocabulary first (one
  * partial-aggregated word count — the dedup-family invariant: pair
  * work runs on unique words, never the corpus), then a row-local
  * symbol explode bounded by word length and a second partial agg on
  * pair keys. Nothing is quadratic; the iterative trainer's only
  * driver traffic is ONE (pair, count) row per merge (the CC-loop
  * driver-scalar pattern, Dedup.dedupClusters).
  *
  * Symbols are code points with the `</w>` end-of-word sentinel
  * (Sennrich's formulation — the sentinel is what lets a learned
  * merge distinguish word-final from word-internal contexts).
  */
object Bpe {

  /** (word, wc) vocabulary frame of the documents table. */
  private def wordCounts(s: SparkSession, dir: String): DataFrame =
    TextOps.tokenRows(Tables.load(s, dir, "documents"))
      .groupBy(col("token").as("word"))
      .agg(count(lit(1)).as("wc"))

  /** Adjacent-pair rows (p1, p2, wc) of a (word, wc, …) frame where
    * `sym` holds the word's current symbol sequence. One row per pair
    * OCCURRENCE (a word with "aaa" under symbols [a,a,a,</w>] yields
    * (a,a) twice), so sum(wc) per (p1, p2) is the classic BPE count.
    */
  private def pairRows(words: DataFrame): DataFrame =
    words
      .filter(size(col("sym")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, size(sym) - 1), " +
          "i -> struct(element_at(sym, i) AS p1, element_at(sym, i + 1) AS p2))"))
        .as("p"))
      .select(col("p.p1").as("p1"), col("p.p2").as("p2"), col("wc"))

  /** Initial symbol column: the word's code points plus `</w>`. */
  private def initialSyms(word: Column): Column =
    concat(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
      array(lit("</w>")))

  /** The counting stage as a query: top-k adjacent symbol pairs of
    * the INITIAL (character) alphabet over the whole corpus — merge 0
    * of training, and the statistic every subsequent merge re-ranks.
    * Deterministic total order (cnt desc, then the pair) so top-k is
    * engine-exact.
    */
  def bpePairs(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    pairRows(wordCounts(s, dir).withColumn("sym", initialSyms(col("word"))))
      .groupBy("p1", "p2").agg(sum(col("wc")).as("cnt"))
      .orderBy(desc("cnt"), col("p1"), col("p2"))
      .limit(k)

  final case class Merge(p1: String, p2: String, cnt: Long)

  /** The full training loop: `nMerges` rounds of count → argmax →
    * merge. Returns the learned merge list and the final symbolized
    * vocabulary. Each round is two distributed jobs (pair count +
    * symbol rewrite); only the winning (pair, count) row crosses to
    * the driver. The rewrite is a greedy left-to-right fold (the
    * reference BPE semantics: "aaa" + merge (a,a) → ["aa", "a"]),
    * expressed as a Catalyst `aggregate` HOF — row-local, bounded by
    * word length. Ties break (cnt desc, p1 asc, p2 asc), making
    * training fully deterministic.
    *
    * Each round's vocabulary is Lineage.cut to truncate the
    * growing lineage, and the previous round's blocks are unpersisted
    * once the next materializes (the CC-loop hygiene, Dedup).
    */
  def train(s: SparkSession, dir: String, nMerges: Int): (Seq[Merge], DataFrame) = {
    var words = wordCounts(s, dir)
      .withColumn("sym", initialSyms(col("word")))
      .transform(graft.Lineage.cut)
    val merges = Seq.newBuilder[Merge]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = pairRows(words)
        .groupBy("p1", "p2").agg(sum(col("wc")).as("cnt"))
        .orderBy(desc("cnt"), col("p1"), col("p2"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += m
        val merged = aggregate(col("sym"),
          array().cast("array<string>"),
          (acc, x) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(m.p1) && x === lit(m.p2),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(element_at(acc, -1), x))))
              .otherwise(concat(acc, array(x))))
        val next = words.withColumn("sym", merged).transform(graft.Lineage.cut)
        words.unpersist()
        words = next
      }
      i += 1
    }
    (merges.result(), words)
  }

  val queries: Seq[Q] = Seq(
    // full re-derivation: DuckDB rebuilds the char+sentinel pair
    // multiset per distinct word via substr arithmetic; sum(wc) is
    // HUGEINT there, cast back to BIGINT. Both engines index strings
    // by code point and compare strings bytewise, so the (cnt desc,
    // pair) total order is engine-exact.
    Q("bpe_pairs", (s, d) => bpePairs(s, d), Some(
      raw"""WITH w AS (
        |  SELECT token AS word, count(*) AS wc FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS token
        |    FROM documents)
        |  WHERE token <> '' GROUP BY token),
        |p AS (
        |  SELECT wc,
        |    substr(word, CAST(i AS INT), 1) AS p1,
        |    CASE WHEN i < length(word)
        |         THEN substr(word, CAST(i AS INT) + 1, 1)
        |         ELSE '</w>' END AS p2
        |  FROM (SELECT word, wc, unnest(range(1, length(word) + 1)) AS i
        |        FROM w))
        |SELECT p1, p2, CAST(sum(wc) AS BIGINT) AS cnt
        |FROM p GROUP BY p1, p2
        |ORDER BY cnt DESC, p1, p2 LIMIT 20""".stripMargin))
  )
}
