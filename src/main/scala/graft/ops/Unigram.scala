package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** D60: unigram-LM (SentencePiece-style) tokenizer training + Viterbi
  * encoding (Kudo 2018, "Subword Regularization: Improving Neural
  * Network Translation Models with Multiple Subword Candidates" —
  * the tokenizer family of T5/LLaMA-class pipelines, beside BPE's
  * merge-list family in [[Bpe]]).
  *
  * The variant implemented is hard (Viterbi) EM with Laplace
  * smoothing — Kudo's §3.2 E-step taken at its argmax, the standard
  * deterministic simplification (full EM sums over all segmentations
  * with forward–backward; the Viterbi point estimate is what the
  * final encoder uses anyway and makes every step exactly
  * reproducible in plain SQL, so the whole trainer is hash-oracled):
  *
  *  1. SEED: candidate pieces are all substrings of corpus words up
  *     to [[MaxPieceLen]] code points, occurrence-counted and
  *     frequency-weighted (Kudo seeds from suffix-array substring
  *     counts; same statistic). Single-character pieces are always
  *     kept (the coverage guarantee); longer pieces need
  *     `minCount` weighted occurrences and only the `maxSeed` most
  *     frequent survive ((cnt desc, piece) order — deterministic cut).
  *  2. EM ROUNDS: each round Viterbi-segments the corpus VOCABULARY
  *     (unique words, frequency-weighted — the [[Bpe.wordCounts]]
  *     Collapse seam: piece statistics never touch the corpus, only
  *     its word shapes) under the current model, re-counts pieces
  *     from the chosen segmentations, drops multi-char pieces that
  *     won no occurrences (the prune step), and re-derives costs.
  *  3. COST MODEL: cost(p) = round((ln T' − ln(cnt_p+1)) · 1e6) as a
  *     BIGINT, T' = Σ(cnt+1) — the Laplace-smoothed negative
  *     log-probability, QUANTIZED so the dp inside
  *     [[graft.functions.UnigramViterbi]] sums and compares exact
  *     integers: no float fold order can flip a segmentation, and the
  *     DuckDB oracle's dp agrees bit-for-bit (the only cross-engine
  *     float surface is one ln per piece, absorbed by the 1e-6
  *     quantum; the text_pmi shared-expression-shape convention).
  *
  * Scale shape: the corpus collapses to (word, wc) once (partial
  * agg); seeding is a row-local substring explode bounded by
  * word-length · MaxPieceLen plus one partial agg on piece keys; each
  * EM round is ONE distributed job (native Viterbi projection over
  * unique words + explode + partial agg) whose result — the piece
  * table — is model-sized driver state (the k-means centroid / BPE
  * merge-row convention), re-broadcast as the next round's dp table.
  * Encoding joins token occurrences to the encoded VOCABULARY
  * (broadcast at model scale; a word-keyed shuffle join beyond),
  * exactly [[Bpe.bpeEncode]]'s shape.
  *
  * The oracle is the full unrolled re-derivation: DuckDB replays the
  * seed and every EM round — including the Viterbi dp itself, as a
  * list_reduce over code-point positions with (cost, j)-lexicographic
  * tie-breaking (smallest j = longest final piece, exactly the native
  * expression's ascending-j strict-< scan) — so a drifted tie-break,
  * a wrong prune, or a non-minimal segmentation all hash-mismatch.
  */
object Unigram {

  /** Max candidate piece length in code points (seed bound and the
    * dp's lookback window).
    */
  val MaxPieceLen = 4

  final case class Piece(piece: String, cnt: Long, cost: Long)

  /** Quantized Laplace-smoothed costs of a (piece, cnt) table.
    * Driver-side `Math.log` IS Spark's `ln` (same libm call), so this
    * is the same arithmetic the distributed projection would emit.
    */
  private def withCosts(pieces: Seq[(String, Long)]): Seq[Piece] = {
    val lt = math.log(pieces.map(_._2 + 1L).sum.toDouble)
    pieces.map { case (p, c) =>
      Piece(p, c, math.round((lt - math.log((c + 1L).toDouble)) * 1e6))
    }
  }

  private def codePoints(s: String): Int = s.codePointCount(0, s.length)

  /** Seed piece counts: frequency-weighted occurrence counts of all
    * 1..MaxPieceLen-code-point substrings of the unique words. The
    * explode is row-local (≤ len·MaxPieceLen pieces per word) and the
    * count is one partial aggregation on the piece key.
    */
  private def seedCounts(words: DataFrame, minCount: Long,
      maxSeed: Int): Seq[(String, Long)] = {
    val subs = words
      .select(col("wc"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(i + ${MaxPieceLen - 1}, length(word))),
           |    j -> substring(word, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))
      .cache() // consumed twice: the char floor and the ranked multis
    try {
      val chars = subs.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val multi = subs
        .filter(length(col("piece")) > 1 && col("cnt") >= minCount)
        .orderBy(desc("cnt"), col("piece")) // TakeOrderedAndProject
        .limit(maxSeed)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      (chars ++ multi).toSeq
    } finally subs.unpersist()
  }

  /** One hard-EM round: Viterbi-segment the weighted vocabulary under
    * `model`, return the new frequency-weighted piece counts
    * (model-sized — one row per piece that won at least one
    * occurrence).
    */
  private def emCounts(words: DataFrame, model: Seq[Piece]): Map[String, Long] = {
    val vit = graft.functions.unigramViterbi(col("word"),
      model.map(_.piece).toArray, model.map(_.cost).toArray, MaxPieceLen)
    words.select(col("wc"), explode(vit).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Prune + recount: keep every single-char piece (coverage floor,
    * count 0 if unused) and every multi-char piece that won
    * occurrences; costs re-derived from the new counts.
    */
  private def nextModel(prev: Seq[Piece], won: Map[String, Long]): Seq[Piece] =
    withCosts(prev.flatMap { p =>
      val c = won.getOrElse(p.piece, 0L)
      if (c > 0 || codePoints(p.piece) == 1) Some((p.piece, c)) else None
    })

  /** Full training: seed + `rounds` hard-EM rounds over the cached
    * unique-word frame. Returns the words frame (for the encode
    * consumers) and the final model.
    */
  private[ops] def train(s: SparkSession, dir: String, rounds: Int,
      minCount: Long, maxSeed: Int): (DataFrame, Seq[Piece]) = {
    val words = Bpe.wordCounts(s, dir).transform(graft.Lineage.cut)
    var model = withCosts(seedCounts(words, minCount, maxSeed))
    var r = 0
    while (r < rounds) {
      model = nextModel(model, emCounts(words, model))
      r += 1
    }
    (words, model)
  }

  /** D60: the trained unigram vocabulary — (piece, weighted count,
    * quantized cost) after `rounds` hard-EM rounds. The registered
    * train query; the oracle replays seed + every round unrolled.
    */
  def unigramVocab(s: SparkSession, dir: String, rounds: Int = 2,
      minCount: Long = 2L, maxSeed: Int = 20000): DataFrame = {
    val (_, model) = train(s, dir, rounds, minCount, maxSeed)
    import s.implicits._
    model.toDF("piece", "cnt", "cost").orderBy("piece")
  }

  /** D60b: unigram ENCODING — the corpus tokenized under the trained
    * model, per document: whitespace-word count, unigram piece count,
    * and the first word's full piece sequence (`first_enc` pins actual
    * segmentations through the hash compare, the [[Bpe.bpeEncode]]
    * convention). The vocabulary is encoded once (unique words); the
    * corpus joins each token occurrence to its word's segmentation.
    */
  def unigramEncode(s: SparkSession, dir: String, rounds: Int = 2,
      minCount: Long = 2L, maxSeed: Int = 20000): DataFrame = {
    val (words, model) = train(s, dir, rounds, minCount, maxSeed)
    val enc = encodedVocab(words, model)
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(TextOps.wsTokens(col("text")), _ =!= "")))
      .withColumnRenamed("col", "tok")
    toks.join(broadcast(enc), toks("tok") === enc("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_pieces"),
        // space-joined scalar, not an array (ScalarOutputSpec): pieces
        // are substrings of whitespace-split tokens, so never contain
        // a space — the join is lossless
        array_join(min_by(col("sym"), col("pos")), " ").as("first_enc"))
      .orderBy("doc_id")
  }

  /** The vocabulary under its final segmentation: (word, sym, n_sym). */
  private def encodedVocab(words: DataFrame, model: Seq[Piece]): DataFrame = {
    val vit = graft.functions.unigramViterbi(col("word"),
      model.map(_.piece).toArray, model.map(_.cost).toArray, MaxPieceLen)
    words.select(col("word"), vit.as("sym"))
      .withColumn("n_sym", size(col("sym")).cast("long"))
  }

  /** D60c: per-source unigram fertility — pieces per word and chars
    * per piece under the trained model, the [[Bpe.bpeFertility]]
    * diagnostic for the unigram family (an outlier source fragments to
    * near-char granularity = the tokenizer under-serves it).
    */
  def unigramFertility(s: SparkSession, dir: String, rounds: Int = 2,
      minCount: Long = 2L, maxSeed: Int = 20000): DataFrame = {
    val (words, model) = train(s, dir, rounds, minCount, maxSeed)
    val enc = encodedVocab(words, model)
      .select(col("word"), col("n_sym"))
    val toks = Tables.load(s, dir, "documents")
      .select(col("source"),
        explode(filter(TextOps.wsTokens(col("text")), _ =!= "")).as("tok"))
    toks.join(broadcast(enc), toks("tok") === enc("word"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_pieces"),
        sum(length(col("tok")).cast("long")).as("n_chars"))
      .withColumn("pieces_per_word",
        col("n_pieces").cast("double") / col("n_words").cast("double"))
      .withColumn("chars_per_piece",
        col("n_chars").cast("double") / col("n_pieces").cast("double"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------
  // Oracle SQL: the full unrolled re-derivation in DuckDB.
  // ---------------------------------------------------------------

  /** The Viterbi dp as a DuckDB list_reduce over code-point positions.
    * `w` = the word expression, `mp` = the (piece → cost) MAP column.
    * dp states are {c: cost, j: chosen split, s: segmentation};
    * candidates at position i are (cost, j)-lexicographically sorted
    * and the head taken — smallest j on cost ties, exactly the native
    * expression's ascending-j strict-< rule. Positions are smuggled
    * through the fold in the accumulator's own element type (the
    * no-initial-value list_reduce convention of the bpe_encode
    * oracle).
    */
  private def vitSql(w: String, mp: String): String =
    s"""list_reduce(
       |  list_prepend(
       |    [{'c': CAST(0 AS BIGINT), 'j': CAST(0 AS BIGINT),
       |      's': CAST([] AS VARCHAR[])}],
       |    list_transform(range(1, length($w) + 1),
       |      i -> [{'c': CAST(i AS BIGINT), 'j': CAST(0 AS BIGINT),
       |             's': CAST([] AS VARCHAR[])}])),
       |  (acc, x) -> list_append(acc,
       |    list_sort([{'c': acc[CAST(j AS INT) + 1].c
       |                    + $mp[substr($w, CAST(j AS INT) + 1,
       |                        CAST(x[1].c AS INT) - CAST(j AS INT))][1],
       |                'j': j,
       |                's': list_append(acc[CAST(j AS INT) + 1].s,
       |                       substr($w, CAST(j AS INT) + 1,
       |                         CAST(x[1].c AS INT) - CAST(j AS INT)))}
       |               FOR j IN range(greatest(0, x[1].c - $MaxPieceLen), x[1].c)
       |               IF len($mp[substr($w, CAST(j AS INT) + 1,
       |                        CAST(x[1].c AS INT) - CAST(j AS INT))]) > 0
       |                  AND acc[CAST(j AS INT) + 1].c IS NOT NULL])[1])
       |)[length($w) + 1].s""".stripMargin

  /** Shared oracle prefix: `w` word counts, seed `c0`, then `rounds`
    * unrolled (segment → count → prune → re-cost) stages, ending at
    * `c\$rounds` (piece, cnt, cost) and its map `m\$rounds`.
    */
  private def prefixSql(rounds: Int, minCount: Long, maxSeed: Int): StringBuilder = {
    val costOf = (v: String) =>
      s"""CAST(round((ln((SELECT CAST(sum(cnt + 1) AS DOUBLE) FROM $v))
         |    - ln(CAST(cnt + 1 AS DOUBLE))) * 1000000) AS BIGINT)""".stripMargin
    val sb = new StringBuilder
    sb.append(
      raw"""WITH w AS (
        |  SELECT token AS word, CAST(count(*) AS BIGINT) AS wc FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS token
        |    FROM documents)
        |  WHERE token <> '' GROUP BY token),
        |subs AS (
        |  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM (
        |    SELECT wc, substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece
        |    FROM (SELECT word, wc, unnest(range(1, length(word) + 1)) AS i
        |          FROM w)
        |    CROSS JOIN (SELECT unnest(range(1, ${MaxPieceLen + 1})) AS l)
        |    WHERE i + l <= length(word) + 1)
        |  GROUP BY piece),
        |v0 AS (
        |  SELECT piece, cnt FROM subs WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
        |    FROM subs WHERE length(piece) > 1 AND cnt >= $minCount)
        |  WHERE rk <= $maxSeed),
        |c0 AS MATERIALIZED (
        |  SELECT piece, cnt, ${costOf("v0")} AS cost FROM v0),
        |m0 AS (SELECT MAP(list(piece ORDER BY piece),
        |                  list(cost ORDER BY piece)) AS mp FROM c0)""")
    for (r <- 1 to rounds) {
      sb.append(s""",
        |seg$r AS MATERIALIZED (
        |  SELECT w.word, w.wc, ${vitSql("w.word", "mp")} AS seg
        |  FROM w CROSS JOIN m${r - 1}),
        |cn$r AS (
        |  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt
        |  FROM (SELECT wc, unnest(seg) AS piece FROM seg$r) GROUP BY piece),
        |v$r AS (
        |  SELECT c.piece, COALESCE(n.cnt, CAST(0 AS BIGINT)) AS cnt
        |  FROM c${r - 1} c LEFT JOIN cn$r n USING (piece)
        |  WHERE length(c.piece) = 1 OR COALESCE(n.cnt, 0) > 0),
        |c$r AS MATERIALIZED (
        |  SELECT piece, cnt, ${costOf(s"v$r")} AS cost FROM v$r),
        |m$r AS (SELECT MAP(list(piece ORDER BY piece),
        |                   list(cost ORDER BY piece)) AS mp FROM c$r)""")
    }
    sb
  }

  private[ops] def vocabOracleSql(rounds: Int, minCount: Long,
      maxSeed: Int): String = {
    val sb = prefixSql(rounds, minCount, maxSeed)
    sb.append(s"""
        |SELECT piece, cnt, cost FROM c$rounds ORDER BY piece""")
    sb.toString.stripMargin
  }

  /** Appends the final-model vocabulary encode (`encn(word, sym,
    * n_sym)`) to the prefix — the stage both encode-family oracles
    * share.
    */
  private def withEncSql(rounds: Int, minCount: Long,
      maxSeed: Int): StringBuilder = {
    val sb = prefixSql(rounds, minCount, maxSeed)
    sb.append(s""",
        |encn AS MATERIALIZED (
        |  SELECT word, sym, CAST(len(sym) AS BIGINT) AS n_sym FROM (
        |    SELECT w.word, ${vitSql("w.word", "mp")} AS sym
        |    FROM w CROSS JOIN m$rounds))""")
    sb
  }

  private[ops] def encodeOracleSql(rounds: Int, minCount: Long,
      maxSeed: Int): String = {
    val sb = withEncSql(rounds, minCount, maxSeed)
    sb.append(raw""",
        |toks AS (
        |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, arr[CAST(i AS INT)] AS tok
        |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i
        |        FROM (SELECT doc_id,
        |                list_filter(string_split_regex(text, '\s+'),
        |                            t -> t <> '') AS arr
        |              FROM documents)))
        |SELECT t.doc_id, count(*) AS n_words,
        |  CAST(sum(e.n_sym) AS BIGINT) AS n_pieces,
        |  array_to_string(arg_min(e.sym, t.pos), ' ') AS first_enc
        |FROM toks t JOIN encn e ON t.tok = e.word
        |GROUP BY t.doc_id ORDER BY t.doc_id""")
    sb.toString.stripMargin
  }

  private[ops] def fertilityOracleSql(rounds: Int, minCount: Long,
      maxSeed: Int): String = {
    val sb = withEncSql(rounds, minCount, maxSeed)
    sb.append(raw""",
        |toks AS (
        |  SELECT source, unnest(list_filter(string_split_regex(text, '\s+'),
        |                                    t -> t <> '')) AS tok
        |  FROM documents)
        |SELECT t.source, count(*) AS n_words,
        |  CAST(sum(e.n_sym) AS BIGINT) AS n_pieces,
        |  CAST(sum(length(t.tok)) AS BIGINT) AS n_chars,
        |  CAST(sum(e.n_sym) AS DOUBLE) / count(*) AS pieces_per_word,
        |  CAST(sum(length(t.tok)) AS DOUBLE) / CAST(sum(e.n_sym) AS DOUBLE)
        |    AS chars_per_piece
        |FROM toks t JOIN encn e ON t.tok = e.word
        |GROUP BY t.source ORDER BY t.source""")
    sb.toString.stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("unigram_vocab", (s, d) => unigramVocab(s, d),
      Some(vocabOracleSql(2, 2L, 20000))),
    Q("unigram_encode", (s, d) => unigramEncode(s, d),
      Some(encodeOracleSql(2, 2L, 20000))),
    Q("unigram_fertility", (s, d) => unigramFertility(s, d),
      Some(fertilityOracleSql(2, 2L, 20000)))
  )
}
