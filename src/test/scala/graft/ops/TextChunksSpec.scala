package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D28 contract pins for `text_chunks` (window 64, overlap 16,
  * stride 48), hand-computed on crafted token counts.
  */
class TextChunksSpec extends SparkSpec {

  private def toks(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("chunks_docs").toString
    Seq(
      (100L, toks(100)),  // 2 chunks: [0,64) and [48,100)
      (64L, toks(64)),    // exactly one window
      (65L, toks(65)),    // one token past: trailing chunk adds w64
      (10L, toks(10)),    // short doc: a single partial chunk
      (0L, "   "))        // whitespace-only: zero tokens, zero chunks
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("chunk boundaries, counts and text match the hand-computed windows") {
    val rows = TextOps.textChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    // 100 tokens -> [0,64) + [48,100)
    assert(byDoc(100L).toSeq === Seq(
      (100L, 0L, 0L, 64L, (0 until 64).map(i => s"w$i").mkString(" ")),
      (100L, 1L, 48L, 52L, (48 until 100).map(i => s"w$i").mkString(" "))))
    // n == window -> exactly one full chunk
    assert(byDoc(64L).map(t => (t._2, t._3, t._4)).toSeq === Seq((0L, 0L, 64L)))
    // n == window + 1 -> the trailing chunk adds new tokens, so it exists
    assert(byDoc(65L).map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((0L, 0L, 64L), (1L, 48L, 17L)))
    // short doc -> one partial chunk
    assert(byDoc(10L).map(t => (t._2, t._3, t._4)).toSeq === Seq((0L, 0L, 10L)))
    // zero tokens -> zero chunks
    assert(!byDoc.contains(0L))
  }

  test("consecutive chunks share exactly the overlap tokens") {
    val c100 = TextOps.textChunks(spark, dir)
      .filter(col("doc_id") === 100).orderBy("chunk_id")
      .collect().map(_.getString(4).split(" ").toSeq)
    assert(c100(0).takeRight(16) === c100(1).take(16))
  }
}
