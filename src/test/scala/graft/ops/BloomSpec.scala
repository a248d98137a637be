package graft.ops

import scala.util.Random

import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.SparkSpec
import graft.functions.Bloom

/** Bloom-filter primitives and the answer-preservation contract of
  * the prefiltered incremental dedup (SURVEY §2.D1c).
  */
class BloomSpec extends SparkSpec {

  test("bloom primitives: zero false negatives, FP rate within band") {
    val rnd = new Random(42)
    val m = 1 << 14
    val k = 4
    val words = new Array[Long](m / 64)
    val present = Array.fill(1000)(rnd.nextLong())
    present.foreach(Bloom.set(words, _, k))
    val arr = new GenericArrayData(words)
    // the property dedup correctness rests on: every inserted key hits
    assert(present.forall(Bloom.mightContain(arr, _, k)))
    val presentSet = present.toSet
    val absent = Iterator.continually(rnd.nextLong())
      .filterNot(presentSet).take(20000).toArray
    val fp = absent.count(Bloom.mightContain(arr, _, k)).toDouble / absent.length
    val theo = math.pow(1 - math.exp(-k.toDouble * 1000 / m), k)
    assert(fp < 3 * theo + 0.001, s"fp=$fp vs theoretical=$theo")
  }

  test("build/probe agree through the aggregator and expression path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (1L to 200L).map(_ * 0x9e3779b97f4a7c15L)
    val bloomUdaf = udaf(new graft.functions.BloomBuildAgg(1 << 12, 4))
    val bf = spark.createDataset(keys).toDF("k")
      .agg(bloomUdaf(col("k")).as("bf"))
    val probed = spark.createDataset(keys).toDF("k")
      .crossJoin(broadcast(bf))
      .select(graft.functions.bloomMightContain(col("bf"), col("k"), 4).as("hit"))
      .collect()
    assert(probed.forall(_.getBoolean(0)), "aggregator-built filter must hit every inserted key")
  }

  test("bloom build is merge-invariant: 8 partitions build the same bits as 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (1L to 500L).map(_ * 0x9e3779b97f4a7c15L)
    val bloomUdaf = udaf(new graft.functions.BloomBuildAgg(1 << 12, 4))
    def bits(parts: Int) = spark.createDataset(keys).toDF("k")
      .repartition(parts)
      .agg(bloomUdaf(col("k")).as("bf"))
      .head().getSeq[Long](0)
    // OR-merge is associative/commutative: the filter must not depend
    // on how the build was partitioned (what makes it a map-side
    // partial aggregate rather than a single-reducer build)
    assert(bits(8) === bits(1))
  }

  test("dedup_incremental_bloom == dedup_incremental, incl. under a saturated filter") {
    val dir = "/root/testdata/sf0.001"
    val exact = Dedup.dedupIncremental(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(exact.nonEmpty)
    val viaBloom = Dedup.dedupIncrementalBloom(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(viaBloom === exact)
    // a 64-bit filter saturates: every probe answers "maybe", the
    // whole batch takes the exact-verify path — the prefilter must
    // degrade to the plain formulation, never to a wrong answer
    val saturated = Dedup.dedupIncrementalBloom(spark, dir, numBits = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(saturated === exact)
  }
}
