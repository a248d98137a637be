package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D42 (tf-idf keyword extraction): hand-computed weights on a tiny
  * corpus, distinct-text df semantics (the Collapse front-end), the
  * lexicographic tie-break, and the bounded-k slice.
  */
class TextKeywordsSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int = 5) = {
    val dir = java.nio.file.Files.createTempDirectory("tkw").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextOps.textKeywords(spark, dir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
  }

  test("hand-computed weights; df counts unique texts, dups share rows") {
    // unique texts: "apple apple banana" (docs 1, 3) and "banana
    // cherry" (doc 2) → N = 2; df: apple 1, banana 2, cherry 1.
    // idf6(df=1) = round(ln(3/2)+1, 6) = 1.405465; idf6(df=2) = 1.0.
    val out = run(Seq(
      1L -> "apple apple banana",
      2L -> "banana cherry",
      3L -> "apple apple banana"))
    val expected = Set(
      (1L, 1L, "apple", 2.81093), (1L, 2L, "banana", 1.0),
      (2L, 1L, "cherry", 1.405465), (2L, 2L, "banana", 1.0),
      (3L, 1L, "apple", 2.81093), (3L, 2L, "banana", 1.0))
    assert(out.toSet === expected)
  }

  test("equal weights break ties lexicographically") {
    // both tokens: tf 1, df 1 → identical w; rank order must be b < c
    val out = run(Seq(1L -> "c b"))
    assert(out.map(r => (r._2, r._3)).toSeq.sorted ===
      Seq((1L, "b"), (2L, "c")))
  }

  test("k bounds the output per document") {
    val out = run(Seq(1L -> "a b c d e f g"), k = 5)
    assert(out.length === 5)
    assert(out.map(_._2).sorted === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("corpus sanity: ranks contiguous, weights non-increasing per doc") {
    val dir = "/root/testdata/sf0.001"
    val out = TextOps.textKeywords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1L to byRank.length).toSeq)
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3)
        case _ =>
      }
    }
  }
}
