package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sample_split covers every doc, roughly 80/10/10, deterministically") {
    val a = Sampling.sampleSplit(spark, dir).collect()
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(a.length === total)
    val dist = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(dist.keySet === Set("train", "val", "test"))
    // hash split concentrates near the target fractions (loose bounds:
    // the sf0.001 corpus is small)
    assert(dist("train").toDouble / total > 0.7 && dist("train").toDouble / total < 0.9)
    // a second evaluation is bit-identical (pure function of doc_id)
    val b = Sampling.sampleSplit(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("sample_split_grouped: a source never spans two splits") {
    val rows = Sampling.sampleSplitGrouped(spark, dir).collect()
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.length === total)
    // the leakage-safety property: every doc of a source carries the
    // SAME split label (a doc-keyed split scatters each source ~80/10/10)
    val bySource = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getString(2)).toSet).toMap
    assert(bySource.values.forall(_.size === 1),
      s"source spans splits: ${bySource.filter(_._2.size > 1).keys}")
    // non-vacuous: the 20 sources land in more than one split overall
    assert(bySource.values.flatten.toSet.size >= 2)
    // and the grouped split is NOT the doc split relabeled: some doc
    // must differ from its sample_split assignment
    val docSplit = Sampling.sampleSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows.exists(r => docSplit(r.getLong(0)) != r.getString(2)))
  }

  test("batch_by_length: batches bounded, waste beats arrival-order batching") {
    import org.apache.spark.sql.expressions.Window
    val batches = Sampling.batchByLength(spark, dir).collect()
    assert(batches.nonEmpty)
    // (bucket, batch_id, n_docs, max_tokens, sum_tokens, padding_waste)
    assert(batches.forall(_.getLong(2) <= 32), "batch exceeds batchSize")
    assert(batches.forall(r => r.getLong(5) ===
      r.getLong(3) * r.getLong(2) - r.getLong(4)), "waste arithmetic")
    val bucketedWaste = batches.map(_.getLong(5)).sum
    // the same docs batched in plain doc_id arrival order: padding to
    // each batch's max must waste strictly more than length bucketing
    val w = Window.orderBy("doc_id")
    val naiveWaste = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.wsTokenCount(col("text")).as("n"))
      .withColumn("b", floor((row_number().over(w) - 1) / 32.0))
      .groupBy("b")
      .agg((max(col("n")) * count(lit(1)) - sum(col("n"))).as("waste"))
      .agg(sum(col("waste"))).head().getLong(0)
    assert(bucketedWaste < naiveWaste,
      s"bucketed $bucketedWaste !< naive $naiveWaste")
  }

  test("sample_stratified takes exactly min(k, |stratum|) per language") {
    val k = 20
    val picked = Sampling.sampleStratified(spark, dir, k).collect()
    val sizes = graft.Tables.load(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = picked.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    sizes.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0) === math.min(k.toLong, n),
        s"stratum $lang: expected min($k, $n)")
    }
    // ranks are 1..k and doc_ids unique
    assert(picked.map(_.getLong(2)).distinct.length === picked.length)
    assert(picked.filter(_.getString(0) == "en").map(_.getLong(1)).sorted.toSeq
      === (1L to math.min(k.toLong, sizes("en"))).toSeq)
  }

  test("bounded top-k stratified sample equals the window formulation exactly") {
    // the TopKAgg path must reproduce the window's (hk, doc_id)
    // ranking row-for-row, on the tiny corpus and at sf0.01 (where
    // every stratum overflows k and tie-order actually matters)
    for (sf <- Seq(dir, "/root/testdata/sf0.01"); k <- Seq(3, 20)) {
      val w = Sampling.sampleStratified(spark, sf, k).collect().toSeq
      val b = Sampling.sampleStratifiedBounded(spark, sf, k).collect().toSeq
      assert(b === w, s"mismatch at $sf k=$k")
    }
  }

  test("sample_temperature flattens language shares toward uniform, deterministically") {
    val sf = "/root/testdata/sf0.01"
    val natural = graft.Tables.load(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = 250L
    val a = Sampling.sampleTemperature(spark, sf, budget).collect()
    assert(a.length <= budget)
    val got = a.groupBy(_.getString(1)).view.mapValues(_.length.toDouble).toMap
    val n = natural.values.sum.toDouble
    // alpha = 0.5 moves every share toward uniform: the dominant
    // language's sampled share must SHRINK vs its natural share and
    // the rarest language's must GROW (the point of temperature
    // rebalancing)
    val maxLang = natural.maxBy(_._2)._1
    val minLang = natural.minBy(_._2)._1
    assert(got(maxLang) / a.length < natural(maxLang) / n,
      s"dominant $maxLang share did not shrink")
    assert(got(minLang) / a.length > natural(minLang) / n,
      s"rarest $minLang share did not grow")
    // per-language budgets follow the closed form k_l = floor(B*w/S)
    val w = natural.view.mapValues(c => math.sqrt(c.toDouble)).toMap
    val tot = w.toSeq.sortBy(_._1).map(_._2).sum
    natural.keys.foreach { l =>
      val expected = math.min(natural(l), math.floor(budget * w(l) / tot).toLong)
      assert(got(l).toLong === expected, s"lang $l")
    }
    // pure function of (doc_id, lang): re-evaluation is bit-identical
    val b = Sampling.sampleTemperature(spark, sf, budget).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("pack_contexts: bucketed two-phase cumsum equals the plain global window") {
    val budget = 512L // small budget so contexts roll over often
    val packed = Sampling.packContexts(spark, dir, budget)
    // plain single-reducer reference formulation
    val gw = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val plain = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(TextOps.BpePattern)).cast("long").as("tokens"))
      .withColumn("cum", coalesce(sum(col("tokens")).over(gw), lit(0L)))
      .select(col("doc_id"), col("tokens"),
        expr(s"cum DIV ${budget}L").as("ctx_id"),
        pmod(col("cum"), lit(budget)).as("ctx_off"))
      .orderBy("doc_id")
    assert(packed.collect().toSeq === plain.collect().toSeq)
    // invariants: offsets inside the budget, context ids monotone
    val rows = packed.collect()
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) < budget))
    val ids = rows.map(_.getLong(2))
    assert(ids.zip(ids.tail).forall { case (a, b) => a <= b })
    assert(ids.last > 0, "budget too large to exercise rollover")
  }

  test("pack_contexts: hierarchical offsets equal the global window on sparse ids") {
    import spark.implicits._
    // sparse, adversarially-spread doc_ids (big gaps, dense runs) and
    // a tiny fanout forcing >= 3 recursion levels: offsets must still
    // equal the single-reducer global-window answer row-for-row
    val rng = new scala.util.Random(11)
    val ids = {
      var cur = 0L
      (0 until 700).map { _ =>
        cur += (if (rng.nextInt(4) == 0) 1L + rng.nextInt(1000000) else 1L + rng.nextInt(3))
        cur
      }
    }
    val docs = ids.map(id => (id, (0 until rng.nextInt(30)).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 64L
    val packed = Sampling.packContextsOn(docs, budget, fanout = 4)
    val gw = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val plain = docs
      .select(col("doc_id"),
        graft.functions.bpeTokenCount(col("text")).as("tokens"))
      .withColumn("cum", coalesce(sum(col("tokens")).over(gw), lit(0L)))
      .select(col("doc_id"), col("tokens"),
        expr(s"cum DIV ${budget}L").as("ctx_id"),
        pmod(col("cum"), lit(budget)).as("ctx_off"))
      .orderBy("doc_id")
    assert(packed.collect().toSeq === plain.collect().toSeq)
  }

  test("exclusiveOffsets: recursion depth never shows a window more than fanout rows") {
    import spark.implicits._
    // direct unit pin on the offsets core: 2000 sparse keys, fanout 8
    // (depth 4); equals the O(n)-in-one-task formulation
    val rng = new scala.util.Random(5)
    var k = 0L
    val perKey = (0 until 2000).map { _ =>
      k += 1L + rng.nextInt(5000); (k, rng.nextInt(100).toLong)
    }.toDF("k", "v")
    val got = Sampling.exclusiveOffsets(perKey, fanout = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = perKey.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    var acc = 0L
    rows.foreach { case (key, v) =>
      assert(got(key) === acc, s"key $key")
      acc += v
    }
  }
}
