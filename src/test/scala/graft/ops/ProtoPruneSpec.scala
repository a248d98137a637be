package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D45 (prototypicality pruning): the keep rule re-derived
  * independently in exact BigInt arithmetic from the pinned k-means
  * assignment, plus structural invariants (keep set never empty or
  * full for a spread cluster) and the no-window plan guard.
  */
class ProtoPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("keep rule == exact integer mean rule over the assignment") {
    val assign = Similarity.embedKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val micro = assign.map { case (id, pid, cos) =>
      (id, pid, BigInt(math.round(cos * 1e6)))
    }
    val sums = micro.groupBy(_._2).map { case (pid, rows) =>
      pid -> (rows.map(_._3).sum, BigInt(rows.length))
    }
    val expected = micro.map { case (id, pid, m) =>
      val (msum, n) = sums(pid)
      id -> (m * n <= msum)
    }.toMap

    val out = Similarity.sampleProtoPrune(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === expected)
  }

  test("every spread cluster keeps some and drops some") {
    val rows = Similarity.sampleProtoPrune(spark, dir).collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    rows.groupBy(_._1).foreach { case (pid, members) =>
      assert(members.exists(_._3), s"cluster $pid kept nothing")
      // a cluster whose scores are not all identical must also drop
      // its above-mean (most prototypical) members
      if (members.map(_._2).distinct.length > 1)
        assert(members.exists(!_._3), s"cluster $pid dropped nothing")
    }
  }

  test("plan has no window (bounded aggregation + broadcast join only)") {
    val plan = Similarity.sampleProtoPrune(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in plan:\n$plan")
  }
}
