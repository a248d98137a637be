package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Growth contract for the E9/E9b persistent indexes (round-8 verdict
  * item 2): the per-batch history read must scale with what the batch
  * PROBES, not with how large the index has grown. Both indexes are
  * laid out with a probe-group partition column (kgrp = digest
  * prefix, bgrp = top bucket bits per table) and the history reads
  * carry a partition filter built from the batch — this spec runs
  * several admission batches, then asserts on the REAL read seam
  * (the same `historyRead`/`historySigsRead` the stream executes)
  * that (a) the scan plan partition-prunes to strictly fewer files
  * than the index holds, and (b) the pruned read loses no row the
  * probe can use — survivors are identical to an unpruned run.
  */
class StreamIndexPruneSpec extends SparkSpec {

  /** Files actually read by the frame's parquet scans (metric-based,
    * so it measures pruning, not just plan text).
    */
  private def filesScanned(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  private def parquetFiles(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .count(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
  }

  test("E9 digest index: a trickle batch reads only its prefix partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("e9prune").toString
    val out = s"$root/out"; val idx = s"$root/idx"
    for (b <- 0 until 4) {
      val docs = (0 until 64)
        .map(i => ((b * 1000 + i).toLong, s"doc $b body $i"))
        .toDF("doc_id", "text")
      TextStreams.applyBatch(spark, docs, b.toLong, out, idx)
    }
    val total = parquetFiles(idx)
    // 4 batches × 16 prefix groups: the index is many-partitioned
    assert(total >= 32, s"index too coarse to measure pruning: $total files")

    // a 1-doc batch probes exactly one prefix group
    val tiny = Seq((9999L, "doc 0 body 3")).toDF("doc_id", "text")
      .withColumn("tkey", md5(col("text").cast("binary")))
    val pruned = TextStreams.historyRead(spark, idx, 4L, tiny)
    val scanned = filesScanned(pruned)
    assert(scanned <= total / 4,
      s"pruning ineffective: scanned $scanned of $total index files")

    // no probe-able row lost: survivors == unpruned formulation
    val full = spark.read.parquet(idx)
      .filter(col("ingest_batch") =!= 4L).select("tkey")
    val s1 = graft.ops.Dedup.newAgainstHistory(tiny, pruned)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = graft.ops.Dedup.newAgainstHistory(tiny, full)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    assert(s1.isEmpty, "the planted exact dup must be dropped either way")
  }

  test("E9b sigs index: a trickle batch reads only its probed (tbl, bgrp) partitions") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    def vec(): Array[Float] = Array.fill(16)(rng.nextGaussian().toFloat)
    val root = Files.createTempDirectory("e9bprune").toString
    val out = s"$root/out"; val idx = s"$root/idx"
    val history = (0 until 4).map(b =>
      b -> (0 until 48).map(i => ((b * 1000 + i).toLong, vec())))
    for ((b, vs) <- history)
      EmbedStreams.applyBatch(spark, vs.toDF("vec_id", "embedding"),
        b.toLong, out, idx)
    val sigsDir = s"$root/idx/sigs"
    val total = parquetFiles(sigsDir)
    assert(total >= 64, s"sigs index too coarse to measure pruning: $total files")

    // 1 vector probes ≤ 8 tables × 5 groups = 40 of the 128 (tbl,
    // bgrp) partitions — strictly less than the index holds
    val tiny = Seq((9999L, history.head._2.head._2)).toDF("vec_id", "embedding")
    val pruned = EmbedStreams.historySigsRead(spark, sigsDir, 4L, tiny)
    val scanned = filesScanned(pruned)
    assert(scanned < total * 40 / 100,
      s"pruning ineffective: scanned $scanned of $total sigs files")

    // no probe-able row lost: the admitted set for the tiny batch is
    // the same against the pruned and the full index (the vector is a
    // byte-identical copy of an admitted one → dropped both ways)
    val fullSigs = spark.read.parquet(sigsDir)
      .filter(col("ingest_batch") =!= 4L)
      .select(col("vec_id"), col("tbl"), col("bucket"))
    val vecs = spark.read.parquet(s"$root/idx/vecs")
      .filter(col("ingest_batch") =!= 4L)
      .select(col("vec_id"), col("embedding"))
    val k1 = graft.ops.Dedup.newVectorsAgainstHistory(tiny, pruned, vecs, 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val k2 = graft.ops.Dedup.newVectorsAgainstHistory(tiny, fullSigs, vecs, 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(k1 === k2)
    assert(k1.isEmpty, "the planted exact dup must be dropped either way")
  }
}
