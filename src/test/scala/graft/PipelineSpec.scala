package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The chained curation pipeline: stage counts are consistent, kept
  * docs all pass the gate, and the written corpus is split-partitioned
  * with no source spanning two splits.
  */
class PipelineSpec extends SparkSpec {

  test("pipeline chains gate + grouped split into a partitioned corpus") {
    val sf = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("pipe_out").toString
    val counts = Pipeline.run(spark, sf, out)
    assert(counts("n_input") === 500L)
    assert(counts("n_kept") > 0L && counts("n_kept") <= counts("n_input"))
    // split partitions sum back to the kept count
    val splitKeys = counts.keySet.filter(_.startsWith("n_") )
      .diff(Set("n_input", "n_kept"))
    assert(splitKeys.nonEmpty)
    assert(splitKeys.toSeq.map(counts).sum === counts("n_kept"))
    val corpus = spark.read.parquet(s"$out/corpus")
    // every written doc passes the gate (keep == true for its id)
    val keepIds = graft.ops.TextOps.curationGate(spark, sf)
      .filter(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val written = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(written === keepIds)
    // leakage safety survives the chain: no source in two splits
    val spans = corpus.groupBy("source")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(spans === 0L)
  }
}
