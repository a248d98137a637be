package graft.ops

/** DuckDB re-derivations of the engine's hash primitives — the SQL
  * that lets the MinHash/SimHash dedup operators be HASH-ORACLED
  * instead of rows-only (round 13; the dedup_image DhashCtes argument
  * applied to the signature family: [[graft.functions.MinHashSig]] /
  * [[graft.functions.SimHash64]] / [[graft.functions.ShingleIds]] are
  * deterministic functions of the text, so DuckDB can recompute them
  * bit-for-bit and the driver's hash compare pins the WHOLE pipeline —
  * tokenization, XXH64, Murmur3, banding, verification, survivor
  * rule).
  *
  * DuckDB has neither xxHash64 nor Spark's Murmur3, and its integer
  * arithmetic traps on overflow, so the wrapping 64-/32-bit arithmetic
  * is emulated exactly:
  *  - u64 values live in HUGEINT on [0, 2^64); `a·b mod 2^64` splits
  *    both operands at 2^32 (the 2^64-order term vanishes mod 2^64 and
  *    every partial product fits HUGEINT), adds/rotates reduce mod
  *    2^64, xor goes through UBIGINT (bit-exact for the value range).
  *  - u32 values live in UBIGINT on [0, 2^32); products fit UBIGINT.
  *  - Byte access: `hex(encode(tok))` + a strpos hex-digit parse —
  *    code-point-safe (bytes, not chars), so non-ASCII text hashes
  *    identically.
  *
  * Every hash step is its own MATERIALIZED CTE stage: DuckDB inlines
  * lateral column aliases (and un-materialized CTEs) by substitution,
  * and a chained hash written as one expression re-explodes
  * exponentially at bind time (measured: the binder alone held 5 GB
  * before the per-stage materialization; with it the whole chain binds
  * and runs in milliseconds).
  *
  * Each primitive was validated bit-for-bit against Spark's own
  * `xxhash64`/`hash` on empty/1..65-byte/multi-byte-UTF-8 inputs —
  * full tail/4-byte/8-byte-word/32-byte-stripe coverage — and the
  * standing check is the driver's own oracle gate: any drift in
  * either engine's hash, tokenization, banding, cap or survivor rule
  * hash-mismatches `dedup_minhash`/`dedup_simhash` directly.
  */
private[ops] object HashOracles {

  private val M64 = "18446744073709551616::HUGEINT"
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private def mul64(a: String, b: String): String =
    s"((((($a) // 4294967296::HUGEINT) * (($b) % 4294967296::HUGEINT)" +
      s" + (($a) % 4294967296::HUGEINT) * (($b) // 4294967296::HUGEINT))" +
      s" * 4294967296::HUGEINT" +
      s" + (($a) % 4294967296::HUGEINT) * (($b) % 4294967296::HUGEINT)) % $M64)"
  private def add64(a: String, b: String) = s"((($a) + ($b)) % $M64)"
  private def rotl64(x: String, r: Int) =
    s"(((($x) * ${1L << r}::HUGEINT) % $M64) + (($x) // ${1L << (64 - r)}::HUGEINT))"
  private def xor64(a: String, b: String) =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT"
  private def shr64(x: String, r: Int) = s"(($x) // ${1L << r}::HUGEINT)"

  /** XXH64 avalanche (fmix) as chained stages ending at `{p}out`. */
  private def xfmix(h: String, p: String): Seq[(String, String)] = Seq(
    s"${p}f1" -> xor64(h, shr64(h, 33)),
    s"${p}f2" -> mul64(s"${p}f1", P2),
    s"${p}f3" -> xor64(s"${p}f2", shr64(s"${p}f2", 29)),
    s"${p}f4" -> mul64(s"${p}f3", P3),
    s"${p}out" -> xor64(s"${p}f4", shr64(s"${p}f4", 32)))

  /** XXH64.hashLong(v, seed) stages ending at `{p}out` (u64 in/out). */
  private def xxhLong(v: String, seed: String, p: String): Seq[(String, String)] =
    Seq(
      s"${p}a" -> add64(add64(seed, P5), "8::HUGEINT"),
      s"${p}b" -> xor64(s"${p}a", mul64(rotl64(mul64(v, P2), 31), P1)),
      s"${p}c" -> add64(mul64(rotl64(s"${p}b", 27), P1), P4)) ++
      xfmix(s"${p}c", p)

  /** XXH64 of a token's UTF-8 bytes, seed 42 — the full byte layout:
    * 32-byte stripes (fold), trailing 8-byte words (fold), optional
    * 4-byte word, tail bytes (fold), avalanche. Stages end at
    * `{p}out`; requires a column named by `tok`.
    */
  private def xxhBytes(tok: String, p: String): Seq[(String, String)] = {
    val seed = "42::HUGEINT"
    val lane = (v: Int) => mul64(rotl64(add64(s"acc[${v + 1}]",
      mul64(s"${p}ws[(4*x[1] + ${v + 1})::INT]", P2)), 31), P1)
    val w8step = add64(mul64(rotl64(xor64("acc",
      mul64(rotl64(mul64(s"${p}ws[(x + 1)::INT]", P2), 31), P1)), 27), P1), P4)
    val w4 = (0 until 4).map(k =>
      s"${p}bs[((${p}blen // 8) * 8 + ${k + 1})::INT] * ${math.pow(256, k).toLong}::HUGEINT")
      .mkString(" + ")
    val bstep = mul64(rotl64(xor64("acc", mul64("x", P5)), 11), P1)
    Seq(
      s"${p}hx" -> s"hex(encode($tok))",
      s"${p}blen" -> s"octet_length(encode($tok))",
      s"${p}bs" -> (s"list_transform(range(1, ${p}blen + 1), bi -> " +
        s"(strpos('0123456789ABCDEF', substr(${p}hx, 2*bi::INT - 1, 1)) - 1)::HUGEINT * 16 + " +
        s"(strpos('0123456789ABCDEF', substr(${p}hx, 2*bi::INT, 1)) - 1)::HUGEINT)"),
      s"${p}ws" -> (s"list_transform(range(0, ${p}blen // 8), wi -> " +
        (0 until 8).map(k =>
          s"${p}bs[(8*wi + ${k + 1})::INT] * ${math.pow(256, k).toLong}::HUGEINT")
          .mkString(" + ") + ")"),
      s"${p}sn" -> s"(${p}blen // 32)::INT",
      s"${p}accs" -> (s"CASE WHEN ${p}blen >= 32 THEN list_reduce(list_prepend(" +
        s"[${add64(add64(seed, P1), P2)}, ${add64(seed, P2)}, $seed, " +
        s"${add64(seed, s"($M64 - $P1)")}]," +
        s" list_transform(range(0, ${p}sn), si -> " +
        s"[si::HUGEINT, 0::HUGEINT, 0::HUGEINT, 0::HUGEINT]))," +
        s" (acc, x) -> [${(0 until 4).map(lane).mkString(",")}]) END"),
      s"${p}hm0" -> (s"CASE WHEN ${p}blen >= 32 THEN " +
        add64(add64(rotl64(s"${p}accs[1]", 1), rotl64(s"${p}accs[2]", 7)),
          add64(rotl64(s"${p}accs[3]", 12), rotl64(s"${p}accs[4]", 18))) + " END")) ++
      (0 until 4).map { i =>
        val k = mul64(rotl64(mul64(s"${p}accs[${i + 1}]", P2), 31), P1)
        s"${p}hm${i + 1}" -> (s"CASE WHEN ${p}blen >= 32 THEN " +
          add64(mul64(xor64(s"${p}hm$i", k), P1), P4) + " END")
      } ++ Seq(
      s"${p}h0" -> s"CASE WHEN ${p}blen >= 32 THEN ${p}hm4 ELSE ${add64(seed, P5)} END",
      s"${p}h1" -> add64(s"${p}h0", s"${p}blen::HUGEINT"),
      s"${p}h2" -> (s"CASE WHEN ${p}blen // 8 > 4*${p}sn THEN " +
        s"list_reduce(list_prepend(${p}h1, " +
        s"list_transform(range(4*${p}sn, ${p}blen // 8), wi -> wi::HUGEINT)), " +
        s"(acc, x) -> $w8step) ELSE ${p}h1 END"),
      s"${p}h3" -> (s"CASE WHEN ${p}blen % 8 >= 4 THEN " +
        add64(mul64(rotl64(xor64(s"${p}h2", mul64(s"($w4)", P1)), 23), P2), P3) +
        s" ELSE ${p}h2 END"),
      s"${p}ot" -> s"(${p}blen // 8) * 8 + CASE WHEN ${p}blen % 8 >= 4 THEN 4 ELSE 0 END",
      s"${p}h4" -> (s"CASE WHEN ${p}blen > ${p}ot THEN " +
        s"list_reduce(list_prepend(${p}h3, ${p}bs[(${p}ot + 1)::INT : ${p}blen::INT]), " +
        s"(acc, x) -> $bstep) ELSE ${p}h3 END")) ++
      xfmix(s"${p}h4", p)
  }

  // ---- Murmur3_x86_32 (Spark's hash(), seed 42) in u32/UBIGINT ----

  private val M32 = "4294967296::UBIGINT"
  private def mul32(a: String, b: String) = s"((($a) * ($b)) % $M32)"
  private def add32(a: String, b: String) = s"((($a) + ($b)) % $M32)"
  private def rotl32(x: String, r: Int) =
    s"(((($x) * ${1L << r}::UBIGINT) % $M32) + (($x) // ${1L << (32 - r)}::UBIGINT))"
  private def xor32(a: String, b: String) = s"xor(($a)::UBIGINT, ($b)::UBIGINT)"
  private def shr32(x: String, r: Int) = s"(($x) // ${1L << r}::UBIGINT)"
  private def mixk1(k: String) =
    mul32(rotl32(mul32(k, "3432918353::UBIGINT"), 15), "461845907::UBIGINT")
  private def mixh1(h: String, k: String) =
    add32(mul32(rotl32(xor32(h, k), 13), "5::UBIGINT"), "3864292196::UBIGINT")

  private def mfmix(h: String, len: Int, p: String): Seq[(String, String)] = Seq(
    s"${p}g0" -> xor32(h, s"$len::UBIGINT"),
    s"${p}g1" -> xor32(s"${p}g0", shr32(s"${p}g0", 16)),
    s"${p}g2" -> mul32(s"${p}g1", "2246822507::UBIGINT"),
    s"${p}g3" -> xor32(s"${p}g2", shr32(s"${p}g2", 13)),
    s"${p}g4" -> mul32(s"${p}g3", "3266489909::UBIGINT"),
    s"${p}out" -> xor32(s"${p}g4", shr32(s"${p}g4", 16)))

  /** Murmur3.hashLong(v u64, seed u32) stages, ending `{p}out` (u32). */
  private def mmLong(v: String, seed: String, p: String): Seq[(String, String)] =
    Seq(
      s"${p}h1" -> mixh1(seed, mixk1(s"(($v) % $M32)")),
      s"${p}h2" -> mixh1(s"${p}h1", mixk1(s"(($v) // $M32)"))) ++
      mfmix(s"${p}h2", 8, p)

  /** Murmur3.hashInt(v u32, seed u32) stages, ending `{p}out` (u32). */
  private def mmInt(v: String, seed: String, p: String): Seq[(String, String)] =
    Seq(s"${p}h1" -> mixh1(seed, mixk1(v))) ++ mfmix(s"${p}h1", 4, p)

  // ---- value-domain converters ----
  private def u64ToSigned(u: String) =
    s"(CASE WHEN ($u) >= 9223372036854775808::HUGEINT THEN (($u) - $M64)::BIGINT ELSE ($u)::BIGINT END)"
  private def u32ToSigned(u: String) =
    s"(CASE WHEN ($u) >= 2147483648::UBIGINT THEN ($u)::BIGINT - 4294967296 ELSE ($u)::BIGINT END)"
  private def s32ToU32(s: String) =
    // add BEFORE casting: a negative value cannot cast to UBIGINT
    s"(CASE WHEN ($s) < 0 THEN (($s) + 4294967296)::UBIGINT ELSE ($s)::UBIGINT END)"

  /** One MATERIALIZED CTE per stage (see object scaladoc for why). */
  private def chain(from: String, p: String,
      stages: Seq[(String, String)]): (String, String) = {
    var prev = from
    val sb = new StringBuilder
    for (((n, e), i) <- stages.zipWithIndex) {
      sb.append(s",\n${p}c$i AS MATERIALIZED (SELECT *, $e AS $n FROM $prev)")
      prev = s"${p}c$i"
    }
    (sb.toString, prev)
  }

  /** Shared front: `tokh(tok, th)` = XXH64(token bytes, 42) as u64
    * HUGEINT for every DISTINCT whitespace token of the corpus
    * (Java split("\\s+", -1) semantics — leading/trailing empties are
    * tokens, exactly the native scanners' tokenization).
    */
  private def tokhCtes: String = {
    val (c, last) = chain("xtok", "xt", xxhBytes("tok", "xt"))
    raw"""xtok AS (
      |  SELECT DISTINCT unnest(string_split_regex(text, '\s+')) AS tok
      |  FROM documents WHERE text IS NOT NULL)""".stripMargin +
      c + s",\ntokh AS MATERIALIZED (SELECT tok, xtout AS th FROM $last)"
  }

  /** dedup_simhash: per-doc 64-bit simhash + smallest near-dup
    * neighbor (Hamming ≤ 3 via 4×16-bit banding on the exact-collapsed
    * texts), re-derived end to end.
    */
  def simhashOracle(maxHamming: Int = 3, cap: Int = 10000): String = {
    // sign-fold: Σ_b 2^b when the Σ±1 vote for bit b is positive
    val bits = (0 until 64).map(b =>
      s"CASE WHEN sum(CASE WHEN (th // ${if (b == 0) "1::HUGEINT"
        else s"${java.math.BigInteger.ONE.shiftLeft(b)}::HUGEINT"}) % 2 = 1 " +
        s"THEN 1 ELSE -1 END) > 0 THEN ${java.math.BigInteger.ONE.shiftLeft(b)}::HUGEINT " +
        "ELSE 0::HUGEINT END").mkString(" + ")
    raw"""WITH ${tokhCtes},
      |uniq AS (SELECT text, min(doc_id) AS rep FROM documents
      |         WHERE text IS NOT NULL GROUP BY text),
      |d2r AS (SELECT d.doc_id, u.rep FROM documents d JOIN uniq u USING (text)),
      |rtok AS (
      |  SELECT u.rep, unnest(string_split_regex(u.text, '\s+')) AS tok
      |  FROM uniq u),
      |sims AS MATERIALIZED (
      |  SELECT rep, ($bits) AS sh
      |  FROM rtok JOIN tokh USING (tok) GROUP BY rep),
      |bands AS (
      |  SELECT rep, sh, b, (sh // CASE b WHEN 0 THEN 1::HUGEINT
      |      WHEN 1 THEN 65536::HUGEINT WHEN 2 THEN 4294967296::HUGEINT
      |      ELSE 281474976710656::HUGEINT END) % 65536 AS bh
      |  FROM sims, (SELECT unnest([0, 1, 2, 3]) AS b)),
      |capped AS (
      |  SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY b, bh) <= $cap),
      |pairs AS (
      |  SELECT DISTINCT x.rep AS a, x.sh AS ha, y.rep AS b2, y.sh AS hb
      |  FROM capped x JOIN capped y
      |    ON x.b = y.b AND x.bh = y.bh AND x.rep < y.rep),
      |ver AS (
      |  SELECT a, b2 FROM pairs
      |  WHERE bit_count(xor(ha::UBIGINT, hb::UBIGINT)) <= $maxHamming),
      |nbr AS (
      |  SELECT rep, min(nbr) AS min_nbr FROM (
      |    SELECT a AS rep, b2 AS nbr FROM ver
      |    UNION ALL SELECT b2 AS rep, a AS nbr FROM ver)
      |  GROUP BY rep)
      |SELECT d.doc_id, ${u64ToSigned("s.sh")} AS simhash,
      |  least(COALESCE(n.min_nbr, d.rep), d.rep) AS keep_id
      |FROM d2r d JOIN sims s ON s.rep = d.rep
      |LEFT JOIN nbr n ON n.rep = d.rep
      |ORDER BY d.doc_id""".stripMargin
  }

  /** dedup_minhash: per-doc keep_id under MinHash-LSH banding (64
    * slots, 16 bands × 4 rows, bucket cap, exact-Jaccard ≥ threshold
    * verification, smallest-neighbor survivor rule on the
    * shingle-set-collapsed corpus), re-derived end to end.
    */
  def minhashOracle(threshold: Double = 0.5, cap: Int = 10000): String = {
    // shingle id: XXH64.hashLong chained over the 3 token hashes
    val (g1, l1) = chain("trip", "sa", xxhLong("a", "42::HUGEINT", "sa"))
    val (g2, l2) = chain(l1, "sb", xxhLong("b", s"saout", "sb"))
    val (g3, l3) = chain(l2, "sc", xxhLong("c", s"sbout", "sc"))
    // slot value: hashInt(j, hashLong(shid, 42)) — signed min per slot
    val (m1, ml1) = chain("shuj", "mb", mmLong("h", "42::UBIGINT", "mb"))
    val (m2, ml2) = chain(ml1, "ms", mmInt("j::UBIGINT", "mbout", "ms"))
    // band hash: Spark hash(array<int>) = hashInt chained over the 4
    // slot values (each converted back to u32), seed 42
    val bchain = (0 until 4).foldLeft(Seq.empty[(String, String)] -> "42::UBIGINT") {
      case ((acc, seed), i) =>
        val st = mmInt(s32ToU32(s"sl[${i + 1}]"), seed, s"bb$i")
        (acc ++ st, s"bb${i}out")
    }
    val (bc, bl) = chain("bsl", "bb", bchain._1)
    // the per-doc hash-sequence work collapses by TEXT first (round
    // 14): identical texts yield identical shingle sets, so hseq runs
    // over the ~|unique texts| reps, not the corpus — a doc's rep
    // chains doc -> text-rep -> shingle-set group, and min-over-group
    // of text-rep mins equals the global min doc_id (the engine's own
    // Collapse argument). On the factor-1000 sf100 corpus this is the
    // difference between a 182 s oracle and a 24 GB OOM.
    raw"""WITH ${tokhCtes},
      |uniqx AS MATERIALIZED (
      |  SELECT min(doc_id) AS xrep, text FROM documents
      |  WHERE text IS NOT NULL GROUP BY text),
      |d2x AS (SELECT d.doc_id, u.xrep FROM documents d JOIN uniqx u USING (text)),
      |hseq AS MATERIALIZED (
      |  SELECT t.xrep, list(h.th ORDER BY t.pos) AS ths FROM (
      |    SELECT xrep, i AS pos, arr[i::INT] AS tok
      |    FROM (SELECT xrep, arr, unnest(range(1, len(arr) + 1)) AS i
      |          FROM (SELECT xrep, string_split_regex(text, '\s+') AS arr
      |                FROM uniqx))) t
      |  JOIN tokh h USING (tok) GROUP BY t.xrep),
      |dtrip AS MATERIALIZED (
      |  SELECT xrep, ths[i::INT] AS a, ths[(i + 1)::INT] AS b,
      |         ths[(i + 2)::INT] AS c
      |  FROM (SELECT xrep, ths, unnest(range(1, len(ths) - 1)) AS i
      |        FROM hseq WHERE len(ths) >= 3)),
      |trip AS (SELECT DISTINCT a, b, c FROM dtrip)$g1$g2$g3,
      |triph AS MATERIALIZED (SELECT a, b, c, scout AS shid FROM $l3),
      |dshx AS MATERIALIZED (
      |  SELECT d.xrep, list_sort(list(DISTINCT t.shid)) AS sh
      |  FROM dtrip d JOIN triph t USING (a, b, c) GROUP BY d.xrep),
      |reps AS (SELECT sh, min(xrep) AS rep FROM dshx GROUP BY sh),
      |d2r AS (
      |  SELECT x.doc_id, r.rep
      |  FROM d2x x JOIN dshx d USING (xrep) JOIN reps r USING (sh)),
      |shu AS (SELECT DISTINCT unnest(sh) AS h FROM reps),
      |shuj AS (SELECT h, j FROM shu, (SELECT unnest(range(0, 64)) AS j))$m1$m2,
      |slots AS MATERIALIZED (
      |  SELECT h, j, ${u32ToSigned("msout")} AS slot FROM $ml2),
      |sigm AS MATERIALIZED (
      |  -- 64 slots per rep: slot j = signed min over the rep's shingles
      |  SELECT rs.rep, m.j, min(m.slot) AS slot FROM (
      |    SELECT rep, unnest(sh) AS h FROM reps) rs
      |  JOIN slots m USING (h) GROUP BY rs.rep, m.j),
      |siga AS MATERIALIZED (
      |  SELECT rep, list(slot ORDER BY j) AS sig FROM sigm GROUP BY rep),
      |bsl AS (
      |  SELECT rep, band, sig[(4*band + 1)::INT : (4*band + 4)::INT] AS sl
      |  FROM siga, (SELECT unnest(range(0, 16)) AS band))$bc,
      |bandh AS MATERIALIZED (SELECT rep, band, ${bchain._2} AS bh FROM $bl),
      |capped AS (
      |  SELECT * FROM bandh QUALIFY count(*) OVER (PARTITION BY band, bh) <= $cap),
      |cand AS (
      |  SELECT DISTINCT x.rep AS a2, y.rep AS b2
      |  FROM capped x JOIN capped y
      |    ON x.band = y.band AND x.bh = y.bh AND x.rep < y.rep),
      |ver AS (
      |  SELECT a2, b2 FROM cand
      |  JOIN (SELECT rep AS a2, sh AS sha FROM reps) ja USING (a2)
      |  JOIN (SELECT rep AS b2, sh AS shb FROM reps) jb USING (b2)
      |  WHERE len(list_filter(sha, x -> list_contains(shb, x)))::DOUBLE /
      |        (len(sha) + len(shb)
      |         - len(list_filter(sha, x -> list_contains(shb, x))))::DOUBLE
      |        >= $threshold),
      |nbr AS (
      |  SELECT rep, min(nbr) AS min_nbr FROM (
      |    SELECT a2 AS rep, b2 AS nbr FROM ver
      |    UNION ALL SELECT b2 AS rep, a2 AS nbr FROM ver)
      |  GROUP BY rep),
      |repkeep AS (
      |  SELECT r.rep, least(COALESCE(n.min_nbr, r.rep), r.rep) AS keep_rep
      |  FROM (SELECT rep FROM reps) r LEFT JOIN nbr n USING (rep))
      |SELECT d.doc_id, COALESCE(k.keep_rep, d.doc_id) AS keep_id
      |FROM documents d
      |LEFT JOIN d2r USING (doc_id)
      |LEFT JOIN repkeep k USING (rep)
      |ORDER BY d.doc_id""".stripMargin
  }

  /** text_fingerprint (D11): the rolling polynomial fingerprint
    * `fold(tokens, 0, acc -> (acc·31 + pmod(xxh64(tok), M)) mod M)`
    * with M = 2^31−1, re-derived end to end (round 14 — the r13
    * verdict's "strictly simpler than the XXH64 re-derivation that
    * just landed" item): per-token XXH64 over the DISTINCT tokens
    * (tokhCtes), re-sequenced per document in token order, then the
    * exact fold as an order-preserving list_reduce. pmod matches
    * Spark's (h % M + M) % M on the signed hash; every intermediate
    * < 2^36 fits BIGINT on both engines (the ANSI-safety argument on
    * the impl, TextOps.fingerprint).
    */
  def fingerprintOracle: String =
    raw"""WITH ${tokhCtes},
      |hseq AS MATERIALIZED (
      |  SELECT t.doc_id,
      |    list(((${u64ToSigned("h.th")} % 2147483647) + 2147483647)
      |         % 2147483647 ORDER BY t.pos) AS hs
      |  FROM (
      |    SELECT doc_id, i AS pos, arr[i::INT] AS tok
      |    FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i
      |          FROM (SELECT doc_id, string_split_regex(text, '\s+') AS arr
      |                FROM documents WHERE text IS NOT NULL))) t
      |  JOIN tokh h USING (tok) GROUP BY t.doc_id)
      |SELECT doc_id,
      |  list_reduce(list_prepend(0::BIGINT, hs),
      |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
      |FROM hseq ORDER BY doc_id""".stripMargin

  /** ann_lsh (D7): the multi-table SRP-LSH search re-derived end to
    * end (round 14): the deterministic hyperplane family
    * `r(g, i) = ±1 by parity of murmur3.hashInt(i, hashInt(g, 42))`
    * is replayed through the u32 Murmur3 CTE chains, projections are
    * index-order list_reduce folds of the ±(float→double) components
    * (sign flip is exact in IEEE, so ±x equals the engine's
    * add/subtract), sign-fold buckets, the popcount≤`probeRadius`
    * multi-probe flip set (pure combinatorics, inlined), bucket-join
    * candidates, exact cosine re-rank, (cos desc, vec_id) top-k —
    * bit-for-bit [[graft.functions.SrpSig]] + the annLsh plan.
    * Assumes non-empty embeddings (the SrpSig empty-array caveat;
    * graft's corpora guarantee it).
    */
  def srpLshOracle(planes: Int, tables: Int, probeRadius: Int,
      nQueries: Int, k: Int): String = {
    val flips = (0 to probeRadius).flatMap(r =>
      (0 until planes).combinations(r)
        .map(_.foldLeft(0L)((m, p) => m | (1L << p))).toSeq)
    val g = planes * tables
    val (sc, slast) = chain("gs", "gd", mmInt("g::UBIGINT", "42::UBIGINT", "gd"))
    val (pc, plast) = chain("gi", "pn", mmInt("i::UBIGINT", "seed", "pn"))
    raw"""WITH gs AS (SELECT unnest(range(0, $g)) AS g)$sc,
      |seeds AS MATERIALIZED (SELECT g, gdout AS seed FROM $slast),
      |dims AS (SELECT unnest(range(0,
      |  (SELECT max(len(embedding)) FROM embeddings))) AS i),
      |gi AS (SELECT s.g, s.seed, d.i FROM seeds s, dims d)$pc,
      |signs AS MATERIALIZED (
      |  SELECT g, i, CASE WHEN pnout % 2 = 1 THEN 1.0 ELSE -1.0 END AS sgn
      |  FROM $plast),
      |slists AS MATERIALIZED (
      |  SELECT g, list(sgn ORDER BY i) AS sl FROM signs GROUP BY g),
      |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |proj AS MATERIALIZED (
      |  SELECT v.vec_id, s.g,
      |    list_reduce(list_transform(range(1, len(v.e) + 1),
      |      ii -> v.e[ii::INT] * s.sl[ii::INT]), (a, b) -> a + b) AS p
      |  FROM emb v CROSS JOIN slists s),
      |buck AS MATERIALIZED (
      |  SELECT vec_id, g // $planes AS tbl,
      |    CAST(COALESCE(sum(CASE WHEN p > 0
      |      THEN (1::BIGINT << (g % $planes)) END), 0) AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id, g // $planes),
      |probes AS (
      |  SELECT vec_id AS q_id, tbl,
      |         xor(bucket::UBIGINT, f::UBIGINT)::BIGINT AS bucket
      |  FROM buck, (SELECT unnest([${flips.mkString(", ")}]) AS f)
      |  WHERE vec_id < $nQueries),
      |cand AS (
      |  SELECT DISTINCT p.q_id, c.vec_id
      |  FROM probes p JOIN buck c USING (tbl, bucket)),
      |scored AS (
      |  SELECT cd.q_id, cd.vec_id, list_cosine_similarity(ce.e, qe.e) AS cos
      |  FROM cand cd
      |  JOIN emb ce ON ce.vec_id = cd.vec_id
      |  JOIN emb qe ON qe.vec_id = cd.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, cos,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT q_id, rank, vec_id, round(cos, 6) AS cos
      |FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }
}
