package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D47 (CCNet perplexity buckets): the grouped-rank arithmetic must
  * equal SQL ntile(3) exactly (window twin), bucket sizes follow the
  * first-buckets-get-ceil rule, and the production plan carries no
  * language-keyed window (zipWithIndex + broadcast offsets instead).
  */
class PplBucketsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("equals the window-ntile twin") {
    val twin = TextOps.textPerplexity(spark, dir)
      .filter(col("n_bigrams") >= 1)
      .join(graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("tercile", ntile(3).over(
        Window.partitionBy("lang").orderBy(col("avg_bits"), col("doc_id"))))
      .select(col("doc_id"), col("lang"), col("avg_bits"), col("tercile"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))

    val out = TextOps.textPplBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSet === twin.toSet)
  }

  test("bucket sizes: per lang, ceil-first rule and labels") {
    val rows = TextOps.textPplBuckets(spark, dir).collect()
      .map(r => (r.getString(1), r.getInt(3), r.getString(4)))
    assert(rows.forall { case (_, t, b) =>
      (t, b) match {
        case (1, "head") | (2, "middle") | (3, "tail") => true
        case _ => false
      }
    })
    rows.groupBy(_._1).foreach { case (lang, members) =>
      val n = members.length.toLong
      val sizes = members.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val expect = (1 to 3).map(t =>
        t -> (n / 3 + (if (t <= n % 3) 1L else 0L))).filter(_._2 > 0).toMap
      assert(sizes === expect, s"lang $lang sizes")
    }
  }

  test("plan has no window (range-sort + zipWithIndex + broadcast offsets)") {
    val plan = TextOps.textPplBuckets(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec in plan:\n$plan")
  }
}
