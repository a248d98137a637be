package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = {
    // session is shared across suites; never stop it here
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // typed-Aggregator plans (TopKAgg and friends) fall back to
      // SORT-BASED aggregation past 128 distinct keys per task by
      // default — the per-task candidate stream then gets fully
      // sorted, the exact cost the O(k)-state aggregators exist to
      // avoid (found by the r13 knnskew probe: the hot Voronoi task
      // sorted 2e8 rows). 128k keys x O(k) state is a few tens of MB.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 131072)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-spec")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
