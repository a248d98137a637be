package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D35 (cluster-balanced subsample) + D38 (token-budget subsample):
  * semantics pinned against independent re-derivations, and the plans
  * guarded against the unsplittable-window shapes both operators were
  * designed to avoid (the CollapseSkewSpec convention).
  */
class BudgetBalanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex8(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)

  test("sample_cluster_balanced: cap enforced, picks = smallest salted hashes") {
    val cap = 3
    val out = Similarity.sampleClusterBalanced(spark, dir, cap = cap).collect()
    assert(out.nonEmpty)
    // (pid, rk, vec_id): rank dense from 1, never beyond cap
    val byPid = out.groupBy(_.getInt(0))
    for ((pid, rows) <- byPid) {
      val rks = rows.map(_.getLong(1)).sorted
      assert(rks === (1L to rks.size).toArray.toSeq, s"pid $pid ranks $rks")
      assert(rks.size <= cap, s"pid $pid over cap")
    }
    // independent expectation from the (already oracle-pinned) k-means
    // assignment: per cluster, the `cap` members with the smallest
    // 8-hex 'cb:'-salted md5 prefix, ties by vec_id
    val assign = Similarity.embedKmeans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val expected = assign.groupBy(_._2).toSeq.flatMap { case (pid, members) =>
      members.map(_._1).sortBy(v => (md5hex8(s"cb:$v"), v)).take(cap)
        .zipWithIndex.map { case (v, i) => (pid, (i + 1).toLong, v) }
    }.toSet
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      === expected)
    // a full cluster contributes exactly cap (non-vacuous at 50 vecs /
    // 8 clusters: at least one cluster holds >= cap members)
    val sizes = assign.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.exists(_ >= cap), "corpus too small for the cap test")
    for ((pid, n) <- sizes if n >= cap)
      assert(byPid(pid).size === cap)
  }

  test("sample_cluster_balanced: no window partitioned by the cluster key") {
    val plan = Similarity.sampleClusterBalanced(spark, dir)
      .queryExecution.executedPlan.toString
    val partSpec = """windowspecdefinition\(([^)]*)""".r
    for (m <- partSpec.findAllMatchIn(plan)) {
      val partCols = m.group(1).split(" ASC | DESC |specifiedwindowframe").head
      assert(!partCols.contains("pid#"),
        s"cluster-keyed window (a viral cluster = one task):\n$plan")
    }
  }

  test("sample_token_budget == the single-window formulation; prefix semantics") {
    val budget = 1000L
    val out = Sampling.sampleTokenBudget(spark, dir, budget = budget).collect()
    assert(out.nonEmpty)
    // twin: one global window in hash order (fine at spec scale)
    val w = Window.orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val twin = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.bpeTokenCount(col("text")).as("n_toks"),
        substring(md5(concat(lit("bud:"), col("doc_id").cast("string"))),
          1, 8).as("hk"))
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
      .select("doc_id", "n_toks", "cum_before")
      .orderBy("doc_id").collect()
    assert(out.toSeq === twin.toSeq)
    // budget semantics: the selection is the SHORTEST hash-priority
    // prefix reaching the budget — every selected doc starts inside
    // the budget, and the selected total reaches it (or the corpus
    // ran out)
    val total = graft.Tables.load(spark, dir, "documents")
      .select(sum(graft.functions.bpeTokenCount(col("text"))))
      .collect()(0).getLong(0)
    assert(out.forall(_.getLong(2) < budget))
    val selected = out.map(_.getLong(1)).sum
    if (total >= budget) assert(selected >= budget)
    else assert(out.length.toLong ===
      graft.Tables.load(spark, dir, "documents").count())
    // non-vacuous: the budget actually truncates at this SF
    assert(total >= budget, "raise spec budget: corpus smaller than budget")
  }

  test("sample_token_budget: windows only partition by the hash bucket") {
    val df = Sampling.sampleTokenBudget(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val partSpec = """windowspecdefinition\(([^)]*)""".r
    val specs = partSpec.findAllMatchIn(plan).toSeq
    assert(specs.nonEmpty)
    for (m <- specs) {
      val partCols = m.group(1).split(" ASC | DESC |specifiedwindowframe").head
      assert(partCols.contains("bkt#"),
        s"window not bucket-partitioned (global reducer hazard):\n$plan")
    }
  }
}
