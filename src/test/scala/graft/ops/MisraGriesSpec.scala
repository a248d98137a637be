package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{MgEntry, MisraGriesAgg}

/** Misra–Gries heavy-hitters properties, both at the aggregator level
  * (merge-order independence of the GUARANTEES, not the raw counts)
  * and end-to-end through the query.
  */
class MisraGriesSpec extends SparkSpec {

  /** 3 hot tokens (freq 300/200/100) drowned in 400 singleton tokens:
    * N = 1000, so with budget 9 every token with freq > N/10 = 100
    * (hot1, hot2) MUST survive; per-counter error ≤ 100.
    */
  private def overflowCorpus(): (Seq[String], Map[String, Long]) = {
    val toks = Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      Seq.fill(100)("hot3") ++ (0 until 400).map(i => s"rare$i")
    val truth = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    (toks, truth)
  }

  test("guarantees hold under forced overflow, for any partitioning") {
    val (toks, truth) = overflowCorpus()
    val n = toks.length.toLong
    val budget = 9
    for (parts <- Seq(1, 7, 32); seed <- Seq(1, 99)) {
      // different shuffles of the same multiset exercise different
      // reduce orders and partial-merge trees
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      import spark.implicits._
      val mg = udaf(new MisraGriesAgg(budget))
      val sketch = shuffled.toDS().repartition(parts)
        .select(mg(col("value")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token"), col("e.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sketch.size <= budget)
      val maxErr = n / (budget + 1) // 100
      // every true-heavy token survives...
      for ((t, c) <- truth if c > maxErr)
        assert(sketch.contains(t), s"heavy $t (freq $c) lost at parts=$parts seed=$seed")
      // ...and every estimate is a lower bound within the error band
      for ((t, est) <- sketch) {
        assert(est <= truth(t), s"$t overestimated: $est > ${truth(t)}")
        assert(est >= truth(t) - maxErr, s"$t undershot the bound: $est vs ${truth(t)}")
      }
    }
  }

  test("budget >= vocabulary makes the sketch the exact histogram") {
    val exact = TextOps.textVocab(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = TextOps.textTopkSketch(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch === exact)
  }

  test("finish orders deterministically by (count desc, token)") {
    val agg = new MisraGriesAgg(4)
    val out = agg.finish(Map("b" -> 2L, "a" -> 2L, "c" -> 5L))
    assert(out === Seq(MgEntry("c", 5), MgEntry("a", 2), MgEntry("b", 2)))
  }
}
