package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Doc

/** Crash-restart integration for the exactly-once streams (round-9
  * verdict item: the replay specs drive `applyBatch` directly; this
  * drives the CHECKPOINT) — simulate the foreachBatch crash window
  * (every sink written for batch N, streaming offset NOT committed)
  * and then RESTART the real stream on the same checkpoint dir. The
  * restarted stream must reprocess batch N under the same id and
  * leave output + index byte-identical (row-level) to a never-
  * interrupted twin run over the same files.
  */
class StreamCrashRestartSpec extends SparkSpec {

  private def publish(srcDir: String, name: String, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("cr_pub").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.iterator().asScala.toSeq)
      .find(_.getFileName.toString.endsWith(".parquet"))
    assert(part.isDefined, "no part file produced")
    Files.move(part.get, Paths.get(srcDir, name))
  }

  private def rowsOf(dir: String): Seq[Seq[String]] =
    spark.read.parquet(dir).collect()
      .map(_.toSeq.map(String.valueOf).toSeq).toSeq.sortBy(_.mkString("|"))

  test("E9: crash after sink writes, restart from checkpoint == uninterrupted run") {
    import spark.implicits._
    val d0 = Seq(Doc(1, "alpha beta", "en", "s", 10), Doc(2, "gamma delta", "en", "s", 11))
    val d1 = Seq(Doc(3, "alpha beta", "en", "s", 10), Doc(4, "epsilon zeta", "en", "s", 12))

    def run(interrupted: Boolean): (Seq[Seq[String]], Seq[Seq[String]]) = {
      val src = Files.createTempDirectory("e9c_src").toString
      val out = Files.createTempDirectory("e9c_out").toString
      val idx = Files.createTempDirectory("e9c_idx").toString
      val ckpt = Files.createTempDirectory("e9c_ckpt").toString
      publish(src, "b0.parquet", d0.toDF())
      val q0 = TextStreams.dedupStream(spark, src, out, idx, ckpt)
      try q0.processAllAvailable() finally q0.stop()
      publish(src, "b1.parquet", d1.toDF())
      if (interrupted) {
        // the crash window: batch 1's sinks are fully written but the
        // stream never saw it — its offset log still ends at batch 0
        TextStreams.applyBatch(spark, d1.toDF(), batchId = 1L, out, idx)
      }
      val q1 = TextStreams.dedupStream(spark, src, out, idx, ckpt)
      try q1.processAllAvailable() finally q1.stop()
      (rowsOf(out), rowsOf(idx))
    }

    val (outI, idxI) = run(interrupted = true)
    val (outU, idxU) = run(interrupted = false)
    assert(outI === outU, "output diverged after crash-restart")
    assert(idxI === idxU, "digest index diverged after crash-restart")
    // and the answer is right: 3 duplicates history, 4 is admitted
    val ids = outI.flatMap(_.filter(s => s.forall(_.isDigit) && s.length == 1))
    assert(ids.contains("4") && !ids.contains("3"))
  }

  test("E9b: crash after all three sink writes, restart == uninterrupted run") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    def vec(): Array[Float] = Array.fill(8)(rng.nextGaussian().toFloat)
    val v1 = vec(); val v2 = vec(); val v3 = vec()
    val b0 = Seq((1L, v1), (2L, v2))
    val b1 = Seq((3L, v1), (4L, v3)) // 3 = exact dup of history, 4 new

    def run(interrupted: Boolean) = {
      val src = Files.createTempDirectory("e9bc_src").toString
      val out = Files.createTempDirectory("e9bc_out").toString
      val idx = Files.createTempDirectory("e9bc_idx").toString
      val ckpt = Files.createTempDirectory("e9bc_ckpt").toString
      publish(src, "b0.parquet", b0.toDF("vec_id", "embedding"))
      val q0 = EmbedStreams.dedupStream(spark, src, out, idx, ckpt)
      try q0.processAllAvailable() finally q0.stop()
      publish(src, "b1.parquet", b1.toDF("vec_id", "embedding"))
      if (interrupted)
        EmbedStreams.applyBatch(spark, b1.toDF("vec_id", "embedding"),
          batchId = 1L, out, idx)
      val q1 = EmbedStreams.dedupStream(spark, src, out, idx, ckpt)
      try q1.processAllAvailable() finally q1.stop()
      (rowsOf(out), rowsOf(s"$idx/sigs"), rowsOf(s"$idx/vecs"))
    }

    val (outI, sigsI, vecsI) = run(interrupted = true)
    val (outU, sigsU, vecsU) = run(interrupted = false)
    assert(outI === outU, "output diverged after crash-restart")
    assert(sigsI === sigsU, "signature index diverged after crash-restart")
    assert(vecsI === vecsU, "vector table diverged after crash-restart")
    assert(outI.map(_.head).contains("4") && !outI.map(_.head).contains("3"))
  }

}
