package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D39 (training-mix materialization): per-source budget arithmetic and
  * prefix semantics pinned against independent re-derivations, and the
  * plan guarded against the global/source-keyed row-level window the
  * bucketed two-phase form exists to avoid (the BudgetBalanceSpec
  * convention).
  */
class MixtureSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.Tables.load(spark, dir, "documents")

  test("sample_mixture == the per-source single-window formulation") {
    val budget = 1000L
    val out = Sampling.sampleMixture(spark, dir, budget = budget).collect()
    assert(out.nonEmpty)
    // twin: one window per source in hash order (fine at spec scale),
    // budgets recomputed with the same sqrt/sorted-fold recipe
    val toks = docs.select(col("doc_id"), col("source"),
      graft.functions.bpeTokenCount(col("text")).as("n_toks"),
      substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))),
        1, 8).as("hk"))
    val masses = toks.groupBy("source").agg(sum("n_toks").as("t_s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val tot = masses.map { case (_, t) => math.sqrt(t.toDouble) }
      .foldLeft(0.0)(_ + _)
    val budgets = masses.map { case (s, t) =>
      s -> math.min(t, math.floor(budget.toDouble * math.sqrt(t.toDouble) / tot).toLong)
    }.toMap
    val w = Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val twin = toks
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .collect()
      .filter(r => r.getLong(4) < budgets(r.getString(1)))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(out.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq === twin)
    // shortest-prefix semantics per source: every kept doc STARTS
    // inside its source's budget, and each source's kept token total
    // reaches the budget (straddling doc kept) or the source ran out
    val bySource = out.groupBy(_.getString(1))
    for ((s, rows) <- bySource) {
      assert(rows.forall(_.getLong(3) < budgets(s)), s"doc starts past budget in $s")
      val kept = rows.map(_.getLong(2)).sum
      val mass = masses.toMap.apply(s)
      if (mass >= budgets(s)) assert(kept >= budgets(s), s"prefix short in $s")
      else assert(kept === mass)
    }
    // non-vacuous: the budget truncates at least one source here
    assert(out.length < docs.count(), "raise spec budget: nothing truncated")
  }

  test("sample_mixture: over-budget run keeps the whole corpus") {
    val n = docs.count()
    val all = Sampling.sampleMixture(spark, dir, budget = 100000000L).collect()
    assert(all.length.toLong === n)
  }

  test("sample_mixture: every window touches the hash bucket key") {
    val plan = Sampling.sampleMixture(spark, dir)
      .queryExecution.executedPlan.toString
    val partSpec = """windowspecdefinition\(([^)]*)""".r
    val specs = partSpec.findAllMatchIn(plan).toSeq
    assert(specs.nonEmpty)
    // the row-level window partitions by (source, bkt); the offset
    // window runs over bucket-level rows ordered by bkt — both name
    // the bucket key, a source-keyed row-level window would not
    for (m <- specs) {
      val cols = m.group(1).split("specifiedwindowframe").head
      assert(cols.contains("bkt#"),
        s"window without the hash bucket (viral-source hazard):\n$plan")
    }
  }
}
