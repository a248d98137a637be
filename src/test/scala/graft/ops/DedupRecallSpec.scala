package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-pair recall pins for the two dedup family members whose
  * driver checks are rows-only (VERDICT r5 item 5): MinHash+LSH (D2)
  * and SimHash (D3). Mirrors [[DedupEmbedRecallSpec]]: a corpus with
  * KNOWN above-threshold pairs, recall measured against the exact
  * all-pairs answer computed independently in Scala.
  */
class DedupRecallSpec extends SparkSpec {

  private def words(rng: scala.util.Random, n: Int): Array[String] =
    Array.fill(n)(s"w${rng.nextInt(1000)}")

  test("minhash banding: recall >= 0.9 on planted jaccard >= 0.5 pairs") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 120 random 60-token docs (pairwise jaccard ~ 0), plus 50 planted
    // near-dups: k in 1..4 replaced tokens => shingle jaccard roughly
    // (58-3k)/(58+3k), i.e. ~0.66..0.90 — the above-threshold regime
    // where 16x4 banding must deliver (P[candidate] >= ~0.97; right AT
    // j = 0.5 the LSH family itself only gives ~0.64, which is why the
    // plants sit above the threshold, like the embed spec's do)
    val base = (0 until 120).map(i => (i.toLong, words(rng, 60)))
    val planted = (0 until 50).map { j =>
      val (_, toks) = base(j * 2)
      val k = 1 + j % 4
      val out = toks.clone()
      for (i <- 0 until k)
        out(5 + i * 12) = s"zz${j}_$i" // fresh tokens, never in vocab
      ((1000 + j).toLong, out)
    }
    val docs = (base ++ planted)
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text").cache()

    val sets = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

    // exact ground truth from the same shingle definition
    val shingleSets = sets.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val exact = (for {
      a <- shingleSets.keys; b <- shingleSets.keys if a < b
      j = shingleSets(a).intersect(shingleSets(b)).size.toDouble /
        shingleSets(a).union(shingleSets(b)).size
      if j >= 0.5
    } yield (a, b)).toSet
    assert(exact.size >= 40, s"only ${exact.size} planted pairs above threshold")

    val found = Dedup.minhashPairs(sets, 0.5)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact-jaccard verification => no false positives, ever
    assert((found -- exact).isEmpty, s"false positives: ${(found -- exact).take(5)}")
    val recall = found.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${found.size}/${exact.size})")
  }

  test("simhash banding: recall == 1 on all Hamming<=3 pairs (pigeonhole)") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // long docs => large per-bit vote margins => a single replaced
    // token flips only the few near-zero-margin bits, so most planted
    // pairs land at Hamming <= 3; ground truth is recomputed exactly
    // from the native simhash values, so over-shooting plants simply
    // drop out of `exact`
    val base = (0 until 100).map(i => (i.toLong, words(rng, 400)))
    val planted = (0 until 30).map { j =>
      val (_, toks) = base(j * 3)
      val out = toks.clone()
      out(7 + j) = s"zz$j"
      ((1000 + j).toLong, out)
    }
    val docs = (base ++ planted)
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text").cache()

    val uniq = docs.select(col("doc_id"),
      graft.functions.simhash64(col("text")).as("simhash"))

    val sims = uniq.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = (for {
      a <- sims.keys; b <- sims.keys if a < b
      if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
    } yield (a, b)).toSet
    // non-vacuous: the plant produced a healthy number of close pairs
    assert(exact.size >= 15, s"only ${exact.size} Hamming<=3 pairs planted")

    val found = Dedup.simhashPairs(uniq, 3)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4x16-bit banding is LOSSLESS for Hamming <= 3: at most 3 bands
    // can differ, so one band always matches exactly — equality, not
    // a recall floor
    assert(found === exact,
      s"missed: ${(exact -- found).take(5)}; extra: ${(found -- exact).take(5)}")
  }
}
