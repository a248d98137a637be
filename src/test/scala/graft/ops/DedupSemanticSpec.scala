package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract pins for SemDeDup (`dedupSemantic`, SURVEY §2.D5b): the
  * driver oracle proves the composed assignment + scoped pair scan on
  * the testdata corpus, but (like `dedup_embed`) that corpus has no
  * cross-payload pair above the threshold — so the POSITIVE semantics
  * live here, on a planted corpus:
  *
  *  1. scoped candidates find same-cluster near-dups (recall >= 0.95
  *     vs the exact same-cluster pair set) and NEVER produce a
  *     cross-cluster or sub-threshold pair (exact verify + scope);
  *  2. cross-cluster near-dups are deliberately NOT collapsed — the
  *     SemDeDup approximation is a feature with a contract, not a
  *     recall bug;
  *  3. the `pid` column IS the `embedKmeansOn` assignment;
  *  4. identical-vector groups (the sf1 dup corpus shape) always
  *     collapse to their min id — identical payloads share signatures
  *     AND assignment, so recall on exact groups is structural, not
  *     probabilistic.
  */
class DedupSemanticSpec extends SparkSpec {

  private val Dim = 32
  private val Threshold = 0.9

  test("semantic dedup: same-cluster near-dups collapse, cross-cluster never") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def randVec(): Array[Float] = Array.fill(Dim)(rng.nextGaussian().toFloat)
    val base = (0 until 200).map(i => (i.toLong, randVec()))
    val planted = (0 until 60).map { j =>
      val (_, v) = base(j * 3)
      val sigma = 0.20 + 0.003 * j
      val d = v.map(x => (x + sigma * rng.nextGaussian()).toFloat)
      ((1000 + j).toLong, d)
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding").cache()

    // exact above-threshold pairs, split by the k-means assignment
    val assign = Similarity.embedKmeansOn(emb, sorted = false)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exact = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos",
        graft.functions.cosine(col("x.embedding"), col("y.embedding")))
      .filter(col("cos") >= Threshold)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val samePid = exact.filter { case (a, b) => assign(a) == assign(b) }
    assert(samePid.size >= 40, s"only ${samePid.size} same-cluster planted pairs")

    val out = Dedup.dedupSemanticOn(emb, Threshold)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val keep = out.map { case (id, _, k) => id -> k }.toMap

    // (3) pid column is the assignment, bit-for-bit
    out.foreach { case (id, pid, _) =>
      assert(pid == assign(id), s"pid mismatch for $id: $pid vs ${assign(id)}")
    }

    // (2) a collapsed vector's keeper is always in ITS cluster; any
    // cross-cluster exact pair stays uncollapsed unless a same-cluster
    // neighbor explains the collapse (keep maps derive from samePid
    // pairs only)
    val nbrs = samePid.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    keep.foreach { case (id, k) =>
      if (k != id) assert(assign(k) == assign(id),
        s"$id collapsed into $k across clusters (${assign(id)} vs ${assign(k)})")
    }

    // (1) recall >= 0.95 against the exact same-cluster answer: count
    // vectors whose keep label matches the samePid-derived expectation
    val expected = (base ++ planted).map { case (id, _) =>
      id -> math.min(id, nbrs.getOrElse(id, id))
    }.toMap
    val agree = keep.count { case (id, k) => expected(id) == k }
    assert(agree >= (keep.size * 0.95).toInt,
      s"semantic keep labels agree on $agree/${keep.size}")

    // determinism
    val again = Dedup.dedupSemanticOn(emb, Threshold)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.sameElements(out), "non-deterministic output")
    emb.unpersist()
  }

  test("sorted=false output set-equals the sorted one (the 100TB seam)") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    def randVec(): Array[Float] = Array.fill(Dim)(rng.nextGaussian().toFloat)
    val base = (0 until 120).map(i => (i.toLong, randVec()))
    val planted = (0 until 30).map { j =>
      val (_, v) = base(j * 4)
      ((500 + j).toLong,
        v.map(x => (x + 0.2f * rng.nextGaussian().toFloat)))
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding").cache()
    val sortedOut = Dedup.dedupSemanticOn(emb, Threshold)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val unsorted = Dedup.dedupSemanticOn(emb, Threshold, sorted = false)
    // no global Sort in the unsorted plan (the point of the seam:
    // at 100 TB the keep-decision must not pay a full corpus sort)
    assert(!unsorted.queryExecution.optimizedPlan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
      }.exists(_ => true),
      "sorted=false still plans a global Sort")
    val unsortedOut = unsorted
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(unsortedOut === sortedOut)
    emb.unpersist()
  }

  test("init=parallel (k-means||) flows through: valid pids, exact groups still collapse") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    def randVec(): Array[Float] = Array.fill(Dim)(rng.nextGaussian().toFloat)
    // identical-payload groups: collapse is structural under ANY
    // clustering (identical vectors share assignment + signatures), so
    // the pin is init-independent — what's tested here is that the
    // k-means|| assignment actually reaches the scoped pair scan
    val uniq = (0 until 30).map(_ => randVec())
    val rows = for (c <- 0 until 4; g <- 0 until 30)
      yield ((c * 30 + g).toLong, uniq(g))
    val emb = rows.toDF("vec_id", "embedding").cache()
    val out = Dedup.dedupSemanticOn(emb, Threshold, init = "parallel")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expectAssign = Similarity
      .embedKmeansOn(emb, init = "parallel", sorted = false)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { case (id, pid, k) =>
      assert(pid == expectAssign(id), s"pid mismatch for $id")
      assert(k == id % 30, s"vector $id kept by $k, expected ${id % 30}")
    }
    emb.unpersist()
  }

  test("semantic dedup: identical-vector groups always collapse to min id") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def randVec(): Array[Float] = Array.fill(Dim)(rng.nextGaussian().toFloat)
    // 40 unique payloads, 5 copies each (ids striped so group ids are
    // not contiguous — the sf1 generator's shape)
    val uniq = (0 until 40).map(_ => randVec())
    val rows = for (c <- 0 until 5; g <- 0 until 40)
      yield ((c * 40 + g).toLong, uniq(g))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Dedup.dedupSemanticOn(emb, Threshold)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    out.foreach { case (id, k) =>
      assert(k == id % 40, s"vector $id kept by $k, expected ${id % 40}")
    }
  }
}
