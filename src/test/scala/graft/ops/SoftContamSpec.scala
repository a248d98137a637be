package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D58 (soft dedup reweighting) and D59 (decontamination verdict):
  * closed-form answers on planted corpora.
  */
class SoftContamSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory("softc").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("soft dedup: inverse-multiplicity weights, nulls collapse together") {
    val d = Files.createTempDirectory("softc").toString
    Seq((1L, Some("same page")), (2L, Some("same page")),
        (3L, Some("same page")), (4L, Some("unique page")),
        (5L, None), (6L, None))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val w = Dedup.dedupSoft(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w(1L) === ((3L, 0.333333)) && w(2L) === w(1L) && w(3L) === w(1L))
    assert(w(4L) === ((1L, 1.0)))
    assert(w(5L) === ((2L, 0.5)) && w(6L) === ((2L, 0.5)),
      "null texts are one group, not dropped")
    // mass conservation up to the 6dp round: Σ weights ≈ #distinct
    val mass = w.values.map(_._2).sum
    assert(math.abs(mass - 3.0) < 1e-5)
  }

  /** The D14 split label recomputed in the JVM, to plant docs into
    * specific splits by choosing their ids.
    */
  private def splitOf(id: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"split:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    if (hex < "cccccccc") "train" else if (hex < "e6666666") "val" else "test"
  }

  test("contamination verdict: full copy drops, light overlap survives, short doc exempt") {
    val ids = 1L to 400L
    val testId = ids.find(splitOf(_) == "test").get
    val train = ids.filter(splitOf(_) == "train")
    val evalText = "a b c d e f g h i j" // 8 distinct 3-gram shingles
    val d = writeDocs(Seq(
      testId -> evalText,
      train(0) -> evalText, // identical: frac 1.0 -> drop
      train(1) -> "a b c q1 q2 q3 q4 q5 q6 q7", // 1/8 common -> keep
      train(2) -> "z9 z8", // too short to shingle
      train(3) -> "p1 p2 p3 p4 p5")) // zero overlap
    val v = Sampling.contaminationVerdict(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    assert(v.keySet === Set(train(0), train(1), train(2), train(3)),
      "every train doc gets a verdict row; test/val docs do not")
    assert(v(train(0)) === ((8L, 8L, 1.0, true)))
    assert(v(train(1)) === ((8L, 1L, 0.125, false)))
    assert(v(train(2)) === ((0L, 0L, 0.0, false)),
      "unshingleable docs cannot be contaminated")
    assert(v(train(3))._2 === 0L && !v(train(3))._4)
    // threshold is the integer cross-multiplication: 7/8 is ≥ 70%
    val d2 = writeDocs(Seq(
      testId -> evalText,
      train(0) -> "a b c d e f g h i k")) // 7 of its 8 shingles common
    val r2 = Sampling.contaminationVerdict(spark, d2).collect()(0)
    assert(r2.getLong(2) === 7L && r2.getBoolean(4),
      "10*7 >= 7*8 — exactly at the PaLM threshold, dropped")
  }
}
