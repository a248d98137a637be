package graft.ops

import graft.SparkSpec

/** D49 (kNN-density outliers): density and the outlier flag
  * re-derived in exact BigInt arithmetic from the pinned knnGraph
  * edges, flag population sanity, and the no-window plan guard.
  */
class KnnDensitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("density + outlier == exact integer re-derivation from the edges") {
    val edges = Similarity.knnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    val dm = edges.groupBy(_._1).map { case (q, es) =>
      q -> es.map(e => BigInt(math.round(e._2 * 1e6))).sum
    }
    val tot = dm.values.sum
    val n = BigInt(dm.size)
    val expected = dm.map { case (q, m) =>
      q -> (BigDecimal(m) / BigDecimal(5e6), m * n < tot)
    }

    val out = Similarity.knnDensity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.length === dm.size)
    out.foreach { case (q, dens, flag) =>
      val (ed, ef) = expected(q)
      assert(flag === ef, s"vec $q flag")
      // the engine reports density rounded to 6dp of the exact quotient
      assert(math.abs(dens - ed.toDouble) <= 5.001e-7, s"vec $q density")
    }
  }

  test("both populations exist and outliers sit strictly below the mean") {
    val out = Similarity.knnDensity(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getBoolean(2)))
    assert(out.exists(_._2) && out.exists(!_._2))
    val maxOut = out.filter(_._2).map(_._1).max
    val minIn = out.filterNot(_._2).map(_._1).min
    assert(maxOut < minIn + 1e-12) // threshold separates the classes
  }

  test("plan has no window") {
    val plan = Similarity.knnDensity(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in plan:\n$plan")
  }
}
