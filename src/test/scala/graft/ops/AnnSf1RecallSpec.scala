package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ANN recall pinned AT SCALE: the ≥0.9 recall@5 pins ran at sf0.01
  * (500 vectors); this spec rebuilds the sf1 embeddings corpus shape
  * in-process (10 striped copies of the sf0.1 table — 20k vectors,
  * the exact scale_up.py dup-heavy layout the round-7 sf1 sweep used)
  * and measures the REAL operator entry points against brute force on
  * it. Both families must hold their sf0.01 floors at 40× the vector
  * count: 0.9 for multi-table multi-probe SRP-LSH, and the
  * probe-geometry floor 0.4 for hash-pivot IVF (on this dup corpus
  * identical copies share signatures AND list assignment, so both
  * land near 1.0 — the floor guards the machinery, the info line
  * records the measurement).
  */
class AnnSf1RecallSpec extends SparkSpec {

  private lazy val sf1Dir: String = {
    val base = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val stride = base.agg(max(col("vec_id"))).head().getLong(0) + 1
    val big = (0 until 10).map(c =>
        base.select((col("vec_id") + lit(c * stride)).as("vec_id"),
          col("embedding")))
      .reduce(_.unionByName(_))
    val dir = java.nio.file.Files.createTempDirectory("ann_sf1").toString
    big.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("sf1-scale recall@5: LSH and IVF hold their sf0.01 floors on 20k vectors") {
    val bf = pairs(Similarity.annBruteforce(spark, sf1Dir))
    assert(bf.nonEmpty)
    val lsh = pairs(Similarity.annLsh(spark, sf1Dir))
    val ivf = pairs(Similarity.annIvf(spark, sf1Dir))
    val rLsh = bf.intersect(lsh).size.toDouble / bf.size
    val rIvf = bf.intersect(ivf).size.toDouble / bf.size
    info(f"sf1 recall@5 vs bruteforce: ann_lsh $rLsh%.3f, ann_ivf $rIvf%.3f")
    assert(rLsh >= 0.9, f"ann_lsh sf1 recall $rLsh%.3f below the sf0.01 pin 0.9")
    assert(rIvf >= 0.4, f"ann_ivf sf1 recall $rIvf%.3f below the geometry floor 0.4")
  }
}
