package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExportShardsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("export_shards: exhaustive, disjoint, manifest totals equal corpus totals") {
    val m = Sampling.exportShards(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
    // every shard id is a hex nibble and each appears at most once
    val shards = m.map(_.getInt(0))
    assert(shards.forall(s => s >= 0 && s <= 15))
    assert(shards.distinct.length === shards.length)
    // the manifest partitions the corpus: doc and token totals add up
    assert(m.map(_.getLong(1)).sum === docs.count())
    val totTokens = docs
      .agg(sum(graft.functions.wsTokenCount(col("text")))).head.getLong(0)
    assert(m.map(_.getLong(2)).sum === totTokens)
    // deterministic (pure function of doc_id)
    assert(Sampling.exportShards(spark, dir).collect().toSeq === m.toSeq)
  }

  test("writeShards: written files reproduce the manifest and a stable in-shard order") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      val written = Sampling.writeShards(spark, dir, out).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val planned = Sampling.exportShards(spark, dir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(written.toSeq === planned.toSeq,
        "write-side manifest diverges from the planned manifest")
      // each document landed in exactly one shard directory
      val back = spark.read.parquet(out)
      assert(back.count() === back.select("doc_id").distinct().count())
      // in-shard order is the salted-hash shuffle order, not ingest
      // order: positions are sorted within every PHYSICAL FILE. Group
      // by input_file_name(), not by shard: at larger sizes a shard
      // file spans several row-group splits that Spark bin-packs by
      // size, so shard-level concatenation of collect() rows need not
      // be globally ordered even though each written file is (the
      // round-9 advisor's scale-fragility finding).
      val pos = back.select(input_file_name().as("f"), col("pos")).collect()
        .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
      // parquet preserves row order within a split and splits of one
      // file cover disjoint, contiguous row ranges — so per-file rows
      // collected from a single-split read are written-order
      pos.foreach { case (f, ps) =>
        assert(ps === ps.sorted, s"file $f not in shuffle order") }
    } finally graft.LocalFs.deleteRecursively(java.nio.file.Paths.get(out))
  }
}
