#!/usr/bin/env python3
"""One-shot consolidated sf10 oracle sweep → CORRECTNESS_sf10.json.

Round-9 verdict item 5: the 91-green sf10 sweep existed only as six
fragmented /tmp logs; this runs the whole surface once and commits a
durable, auditable record (the BENCH_LOCAL treatment). Skips are
EXPLICIT, reasoned, and recorded in the artifact.

The compare runs INSIDE DuckDB (canonical %.10g float strings, both
directions of EXCEPT ALL) — the %.10g convention of check_oracle.py,
but streaming-friendly for the 120M-row outputs (role_explode) a
pandas sort cannot hold. Driver-faithful dtype guard: a numeric
(int/float) column on one side vs decimal/HUGEINT/object on the other
is a FAIL (the round-9 dedup_image red — pandas maps decimal128 to
object and the driver's hash is dtype-sensitive); date-vs-timestamp
representation differences are note-only (the driver demonstrably
passes those — every daily-counts query was green in r9).

The two dedup_image keys use a BOUNDED oracle instead of the generic
compare (round-11 verdict item 4; previously reasoned skips): the full
DhashCtes re-derivation is O(total pixels) ~ 4e9 rows at 166k images —
an oracle-side cost wall. The bounded form applies the engine's own
collapse argument to the oracle: (1) re-derive EVERY hash bit from the
generator's pixel arithmetic for a bounded deterministic slice — one
representative per distinct engine hash (~2.3k) PLUS an evenly-strided
~2k sample of the remaining images — and require bit-equality with the
engine's hashes; (2) re-compute the EXACT all-pairs keep rule for ALL
166k images independently in DuckDB, at hash-GROUP granularity
(unique² Hamming comparisons, ~5e6), from the engine's hash column
(spot-verified by (1)); (3) full id-set coverage check against
`documents`. The full per-image oracle stays pinned at sf0.01/sf0.1
(driver gate + sf1 sweep).

Usage: sweep_sf10.py <sf10_dir> <verify_out_dir> <out_json> [names...]
(named subset re-runs merge into an existing <out_json>)
"""
import json, os, re, subprocess, sys, glob, time, traceback
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# keys routed to the bounded image compare (module docstring) instead
# of the generic SQL-vs-parquet compare
BOUNDED_IMAGE = {"dedup_image", "dedup_image_incremental"}

# video keys past the pixel wall get the SAME bounded treatment
# (r14 verdict item 3): the full VideoDhashCtes / per-pixel luma
# oracle is O(total sampled pixels) — ~4.4e9 rows at 250k clips —
# so above this documents-count threshold dedup_video[_incremental]
# route to bounded_video_compare (slice hash re-derivation + exact
# group-level keep rule + id cover, the dedup_image convention) and
# mm_video_frames to bounded_video_frames_compare (full header-
# arithmetic compare of every non-luma column + strided per-pixel
# luma re-derivation through the committed oracle SQL itself, run
# under a narrowed `documents` view — the key is row-local per
# media_id, so narrowing the input IS the sample). Below it the
# committed full oracles run unchanged (sf1 = 50k docs stays full).
BOUNDED_VIDEO = {"dedup_video", "dedup_video_incremental"}
VIDEO_FULL_MAX_DOCS = 60_000

# ann_ivfpq's monolithic oracle materializes three n·16mi·16code
# scoring stages (s1/s2/s3: 512M rows at sf100's 2M vectors) each
# under a (vec_id, mi) window — r16 measured its working set past
# 100 GB RAM + 59 GB of spill disk TWICE. Above this vector count it
# routes to staged_ivfpq_compare (the committed CTE bodies executed
# verbatim as temp tables, with those three stages chunked on
# vec_id — see its docstring). sf10 (200k vectors) stays on the
# full one-shot oracle.
IVFPQ_FULL_MAX_VECS = 250_000

# keys whose sf10 output is too large for one EXCEPT ALL pass (the
# 120M-row role_explode spilled >77 GB of DuckDB temp sorting both
# canonical projections at once): the compare runs in N disjoint
# slices on a deterministic integer column. The predicate partitions
# BOTH sides identically, so per-slice multiset equality for every
# slice is exactly global multiset equality — same check, bounded
# spill (peak temp divides by N).
SLICED = {"role_explode": ("l_orderkey", 16),
          # r15 (verdict item 5): closes the sf100 cum_counts
          # exclusion — the 100M-row canonical EXCEPT spilled past
          # host disk in one pass; 16 event_id slices bound the peak
          "cum_counts": ("event_id", 16)}

NUMERIC = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "FLOAT", "DOUBLE",
           "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
FLOATS = {"FLOAT", "DOUBLE"}


def pandas_kind(t):
    t = t.upper().split("(")[0]
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}:
        return "i"
    if t in FLOATS:
        return "f"
    if t == "TIMESTAMP" or t.startswith("TIMESTAMP"):
        return "M"
    return "O"  # VARCHAR, DATE, DECIMAL, HUGEINT->object in pandas


def canon_select(con, view):
    cols = con.execute(f"DESCRIBE {view}").fetchall()
    exprs = []
    for name, typ, *_ in cols:
        t = typ.upper().split("(")[0]
        if t in FLOATS:
            exprs.append(f'printf(\'%.10g\', "{name}") AS "{name}"')
        else:
            exprs.append(f'CAST("{name}" AS VARCHAR) AS "{name}"')
    return cols, f"SELECT {', '.join(exprs)} FROM {view}"


def compare(con, name, sql, out_dir):
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None, "notes": []}
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        rec["err"] = "no spark output"
        return rec
    try:
        con.execute(f"CREATE OR REPLACE VIEW s_raw AS SELECT * FROM read_parquet('{files[0]}')")
        # TEMP TABLE, not VIEW: the count + two EXCEPT passes below
        # would otherwise re-evaluate a heavy oracle three times
        con.execute(f"CREATE OR REPLACE TEMP TABLE o_raw AS ({sql})")
        rec["spark_rows"] = con.execute("SELECT count(*) FROM s_raw").fetchone()[0]
        rec["oracle_rows"] = con.execute("SELECT count(*) FROM o_raw").fetchone()[0]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        scols, ssel = canon_select(con, "s_raw")
        ocols, osel = canon_select(con, "o_raw")
        sn = sorted(c[0] for c in scols)
        on = sorted(c[0] for c in ocols)
        if sn != on:
            rec["schema_match"] = False
            rec["hash_match"] = False
            rec["err"] = f"columns {sn} vs {on}"
            return rec
        kind_fail = False
        stypes = {c[0]: c[1] for c in scols}
        otypes = {c[0]: c[1] for c in ocols}
        for c in sn:
            ks, ko = pandas_kind(stypes[c]), pandas_kind(otypes[c])
            if ks != ko:
                note = f"{c}: {stypes[c]} vs {otypes[c]} (pandas {ks}/{ko})"
                rec["notes"].append(note)
                # numeric-vs-object is the driver-red class (r9
                # dedup_image); date/timestamp representation is not
                if ("i" in (ks, ko) or "f" in (ks, ko)) and "O" in (ks, ko):
                    kind_fail = True
        rec["schema_match"] = not kind_fail
        if name in SLICED:
            col, n = SLICED[name]
            a = b = 0
            for i in range(n):
                # appended to the canon SELECT's raw FROM (s_raw/o_raw),
                # so the predicate sees the original integer column,
                # not its VARCHAR canonicalization
                pred = f'WHERE "{col}" % {n} = {i}'
                ss = f"{ssel} {pred}"
                os_ = f"{osel} {pred}"
                a += con.execute(f"SELECT count(*) FROM (({ss}) EXCEPT ALL ({os_}))").fetchone()[0]
                b += con.execute(f"SELECT count(*) FROM (({os_}) EXCEPT ALL ({ss}))").fetchone()[0]
            # col % n excludes NULL-key rows from EVERY slice on both
            # sides — a final NULL pass closes that hole so per-slice
            # equality really is global equality
            pred = f'WHERE "{col}" IS NULL'
            ss = f"{ssel} {pred}"
            os_ = f"{osel} {pred}"
            a += con.execute(f"SELECT count(*) FROM (({ss}) EXCEPT ALL ({os_}))").fetchone()[0]
            b += con.execute(f"SELECT count(*) FROM (({os_}) EXCEPT ALL ({ss}))").fetchone()[0]
            rec["notes"].append(f"sliced compare: {n} disjoint {col}%{n} slices + NULL pass")
        else:
            a = con.execute(f"SELECT count(*) FROM (({ssel}) EXCEPT ALL ({osel}))").fetchone()[0]
            b = con.execute(f"SELECT count(*) FROM (({osel}) EXCEPT ALL ({ssel}))").fetchone()[0]
        rec["hash_match"] = bool(rec["rows_match"] and not kind_fail
                                 and a == 0 and b == 0)
        if a or b:
            rec["err"] = f"value diff: {a} spark-only, {b} oracle-only canonical rows"
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        try:
            con.execute("DROP TABLE IF EXISTS o_raw")
        except Exception:
            pass
        rec["secs"] = round(time.time() - t0, 1)
        if not rec["notes"]:
            del rec["notes"]
    return rec


def dhash_ctes():
    """The DhashCtes SQL, extracted from Multimodal.scala at runtime so
    the bounded oracle can never drift from the committed definition
    (one source of truth, same argument as the Scala-side reuse)."""
    src = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "src", "main", "scala", "graft", "ops",
                            "Multimodal.scala")).read()
    m = re.search(r'private val DhashCtes: String =\s*"""(.*?)"""\.stripMargin',
                  src, re.S)
    body = m.group(1)
    return "\n".join(re.sub(r"^\s*\|", "", ln) for ln in body.split("\n"))


# group-level Hamming neighborhood CTEs over the ENGINE's hash column
# (eng = one row per png image: media_id, dhash_hi, dhash_lo[, ...]).
# grp carries min id, count and second-min id per distinct hash;
# gp carries the min id over OTHER groups within Hamming 10. All
# pairwise work is unique-hash × unique-hash — the engine's own
# collapse argument applied to the oracle.
GRP_CTES = """
grp0 AS (SELECT dhash_hi, dhash_lo, min(media_id) AS mn, count(*) AS c
         FROM img_eng GROUP BY 1, 2),
grp AS (SELECT g.*, (SELECT min(e.media_id) FROM img_eng e
                     WHERE e.dhash_hi = g.dhash_hi AND e.dhash_lo = g.dhash_lo
                       AND e.media_id > g.mn) AS mn2
        FROM grp0 g),
gp AS (SELECT a.dhash_hi, a.dhash_lo, min(b.mn) AS nbmin
       FROM grp a JOIN grp b
         ON (a.dhash_hi != b.dhash_hi OR a.dhash_lo != b.dhash_lo)
        AND bit_count(xor(a.dhash_hi, b.dhash_hi)) +
            bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 10
       GROUP BY 1, 2)"""


def video_dhash_ctes():
    """The VideoDhashCtes SQL, extracted from Video.scala at runtime so
    the bounded oracle can never drift from the committed definition
    (the dhash_ctes convention, one modality over)."""
    src = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "src", "main", "scala", "graft", "ops",
                            "Video.scala")).read()
    m = re.search(
        r'private val VideoDhashCtes: String =\s*"""(.*?)"""\.stripMargin',
        src, re.S)
    assert m is not None, (
        "could not extract `private val VideoDhashCtes` from Video.scala "
        "— renamed or reformatted? (ADVICE r15: fail loudly, not with an "
        "AttributeError tail)")
    body = m.group(1)
    return "\n".join(re.sub(r"^\s*\|", "", ln) for ln in body.split("\n"))


def video_vids_cte(sf_dir):
    """The `vids` header CTE alone, sliced from the committed
    VideoDhashCtes (ADVICE r15: bounded_video_frames_compare inlined
    the generator's header formulas, so a dial change in Video.scala
    would have drifted silently from this copy until the header
    compare failed confusingly — derive from the single committed
    definition instead, the video_dhash_ctes convention)."""
    ctes = video_dhash_ctes()
    m = re.search(r"(vids AS \(.*?\)),\s*vf AS", ctes, re.S)
    assert m is not None, (
        "could not slice the `vids AS (...)` CTE out of VideoDhashCtes "
        "(Video.scala) — was the CTE renamed?")
    return m.group(1).replace(
        "FROM documents",
        f"FROM read_parquet('{sf_dir}/documents.parquet')")


def bounded_video_compare(con, name, sf_dir, out_dir):
    """Bounded dedup_video / dedup_video_incremental oracle: the
    bounded_image_compare battery on the video signature table —
    (1) slice per-pixel hash re-derivation (one representative per
    distinct engine hash + an evenly-strided sample), (2) the exact
    keep rule for ALL clips at hash-group granularity from the
    engine's (spot-verified) hash column, (3) full id-set cover."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        full = glob.glob(f"{out_dir}/dedup_video/*.parquet")
        if not files or not full:
            rec["err"] = "no spark output (needs dedup_video dump for hashes)"
            return rec
        grp_ctes = GRP_CTES.replace("img_eng", "vid_eng")
        con.execute("CREATE OR REPLACE TEMP TABLE vid_s_raw AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        con.execute("CREATE OR REPLACE TEMP TABLE vid_eng AS "
                    "SELECT media_id, dhash_hi, dhash_lo FROM "
                    f"read_parquet('{full[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM vid_s_raw").fetchone()[0]

        # (3) coverage: eng's id set == every DIB (even) id in documents
        miss, extra = con.execute(
            f"""SELECT
              (SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')
               WHERE doc_id % 2 = 0
                 AND doc_id NOT IN (SELECT media_id FROM vid_eng)),
              (SELECT count(*) FROM vid_eng
               WHERE media_id NOT IN (
                 SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
                 WHERE doc_id % 2 = 0))""").fetchone()
        if miss or extra:
            rec["err"] = f"id coverage: {miss} missing, {extra} extra clips"
            rec["hash_match"] = False
            return rec

        # (2) exact keep rule for ALL rows at hash-group granularity
        if name == "dedup_video":
            bad = con.execute(f"""
              WITH {grp_ctes},
              exp AS (
                SELECT e.media_id, e.dhash_hi, e.dhash_lo,
                  least(e.media_id, coalesce(least(
                    coalesce(p.nbmin, own), coalesce(own, p.nbmin)),
                    e.media_id)) AS keep_id
                FROM (SELECT e.*, CASE WHEN e.media_id > g.mn THEN g.mn
                                       WHEN g.c > 1 THEN g.mn2 END AS own
                      FROM vid_eng e JOIN grp g
                        ON e.dhash_hi = g.dhash_hi AND e.dhash_lo = g.dhash_lo) e
                LEFT JOIN gp p
                  ON e.dhash_hi = p.dhash_hi AND e.dhash_lo = p.dhash_lo)
              SELECT (SELECT count(*) FROM (SELECT * FROM vid_s_raw EXCEPT ALL
                                            SELECT * FROM exp)),
                     (SELECT count(*) FROM (SELECT * FROM exp EXCEPT ALL
                                            SELECT * FROM vid_s_raw)),
                     (SELECT count(*) FROM exp)""").fetchone()
            rec["oracle_rows"] = bad[2]
        else:  # dedup_video_incremental: hist < 250, batch survivors
            bad = con.execute(f"""
              WITH {grp_ctes},
              histg AS (SELECT DISTINCT dhash_hi, dhash_lo FROM vid_eng
                        WHERE media_id < 250),
              hit AS (SELECT DISTINCT b.dhash_hi, b.dhash_lo
                      FROM grp b JOIN histg h
                        ON bit_count(xor(b.dhash_hi, h.dhash_hi)) +
                           bit_count(xor(b.dhash_lo, h.dhash_lo)) <= 10),
              clean AS (SELECT e.* FROM vid_eng e
                        WHERE e.media_id >= 250
                          AND NOT EXISTS (SELECT 1 FROM hit h
                                          WHERE h.dhash_hi = e.dhash_hi
                                            AND h.dhash_lo = e.dhash_lo)),
              cgrp AS (SELECT dhash_hi, dhash_lo, min(media_id) AS mn
                       FROM clean GROUP BY 1, 2),
              cdom AS (SELECT a.dhash_hi, a.dhash_lo, min(b.mn) AS nbmin
                       FROM cgrp a JOIN cgrp b
                         ON (a.dhash_hi != b.dhash_hi OR a.dhash_lo != b.dhash_lo)
                        AND bit_count(xor(a.dhash_hi, b.dhash_hi)) +
                            bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 10
                       GROUP BY 1, 2),
              exp AS (SELECT c.media_id, c.dhash_hi, c.dhash_lo
                      FROM clean c
                      JOIN cgrp g ON c.dhash_hi = g.dhash_hi
                                 AND c.dhash_lo = g.dhash_lo
                      LEFT JOIN cdom d ON c.dhash_hi = d.dhash_hi
                                      AND c.dhash_lo = d.dhash_lo
                      WHERE c.media_id = g.mn
                        AND (d.nbmin IS NULL OR d.nbmin > c.media_id))
              SELECT (SELECT count(*) FROM (SELECT * FROM vid_s_raw EXCEPT ALL
                                            SELECT * FROM exp)),
                     (SELECT count(*) FROM (SELECT * FROM exp EXCEPT ALL
                                            SELECT * FROM vid_s_raw)),
                     (SELECT count(*) FROM exp)""").fetchone()
            rec["oracle_rows"] = bad[2]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = True
        if bad[0] or bad[1]:
            rec["err"] = (f"keep-rule diff: {bad[0]} spark-only, "
                          f"{bad[1]} oracle-only rows")
            rec["hash_match"] = False
            return rec

        # (1) slice hash re-derivation — dedup_video carries it for
        # both keys (one shared vid_eng hash table)
        if name == "dedup_video":
            n_vid = con.execute("SELECT count(*) FROM vid_eng").fetchone()[0]
            stride = 2 * max(1, n_vid // 1500)
            ids = [r[0] for r in con.execute(
                f"""SELECT mn FROM (SELECT min(media_id) AS mn FROM vid_eng
                                    GROUP BY dhash_hi, dhash_lo)
                    UNION SELECT media_id FROM vid_eng
                    WHERE media_id % {stride} = 0""").fetchall()]
            rec["notes"].append(
                f"slice: {len(ids)} of {n_vid} clips (all hash-group reps "
                f"+ every {stride}th id) re-derived per-pixel")
            con2 = duckdb.connect()
            con2.execute(
                f"""CREATE VIEW documents AS
                    SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
                    WHERE doc_id IN ({','.join(map(str, ids))})""")
            derived = con2.execute(
                f"WITH {video_dhash_ctes()} "
                "SELECT media_id, dhash_hi, dhash_lo FROM vhash").fetchall()
            con2.close()
            con.execute("CREATE OR REPLACE TEMP TABLE vid_der "
                        "(media_id BIGINT, dhash_hi BIGINT, dhash_lo BIGINT)")
            con.executemany("INSERT INTO vid_der VALUES (?, ?, ?)", derived)
            nbad, nder = con.execute(
                """SELECT count(*) FILTER (e.dhash_hi != d.dhash_hi
                                           OR e.dhash_lo != d.dhash_lo),
                          count(*)
                   FROM vid_der d JOIN vid_eng e USING (media_id)""").fetchone()
            if nder != len(ids) or nbad:
                rec["err"] = (f"slice hash re-derivation: {nbad} mismatched "
                              f"of {nder} derived (slice {len(ids)})")
                rec["hash_match"] = False
                return rec
        else:
            rec["notes"].append("hash slice check carried by dedup_video "
                                "(shared vid_eng hash table)")
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("vid_s_raw", "vid_eng", "vid_der"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_video_frames_compare(con, name, sql, sf_dir, out_dir):
    """Bounded mm_video_frames oracle: (a) FULL compare of every
    header-arithmetic column (media_id, frame_idx, n_frames, width,
    height — O(rows), no pixels) for all rows, (b) per-pixel
    frame_luma re-derivation for an evenly-strided clip sample by
    running the COMMITTED oracle SQL verbatim under a `documents`
    view narrowed to the sample (the key is row-local per media_id,
    so the narrowed input is exactly the sampled output)."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            rec["err"] = "no spark output"
            return rec
        con.execute("CREATE OR REPLACE TEMP TABLE vf_s_raw AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM vf_s_raw").fetchone()[0]
        # (a) header surface, all rows, both directions
        hdr = f"""
          WITH {video_vids_cte(sf_dir)},
          exp AS (
            SELECT media_id, CAST(unnest(range(0, nf, 4)) AS INT) AS frame_idx,
                   CAST(nf AS INT) AS n_frames, CAST(w AS INT) AS width,
                   CAST(h AS INT) AS height
            FROM vids)"""
        a, b, nexp = con.execute(f"""{hdr}
          SELECT
            (SELECT count(*) FROM (
               SELECT media_id, frame_idx, n_frames, width, height
               FROM vf_s_raw EXCEPT ALL SELECT * FROM exp)),
            (SELECT count(*) FROM (SELECT * FROM exp EXCEPT ALL
               SELECT media_id, frame_idx, n_frames, width, height
               FROM vf_s_raw)),
            (SELECT count(*) FROM exp)""").fetchone()
        rec["oracle_rows"] = nexp
        rec["rows_match"] = rec["spark_rows"] == nexp
        rec["schema_match"] = True
        if a or b:
            rec["err"] = f"header diff: {a} spark-only, {b} oracle-only rows"
            rec["hash_match"] = False
            return rec
        # (b) strided per-pixel luma re-derivation via the committed SQL
        n_vid = con.execute(
            "SELECT count(DISTINCT media_id) FROM vf_s_raw").fetchone()[0]
        stride = 2 * max(1, n_vid // 1000)
        ids = [r[0] for r in con.execute(
            f"""SELECT DISTINCT media_id FROM vf_s_raw
                WHERE media_id % {stride} = 0""").fetchall()]
        rec["notes"].append(
            f"luma slice: {len(ids)} of {n_vid} clips (every {stride}th id) "
            "re-derived per-pixel through the committed oracle SQL")
        con2 = duckdb.connect()
        con2.execute(
            f"""CREATE VIEW documents AS
                SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
                WHERE doc_id IN ({','.join(map(str, ids))})""")
        derived = con2.execute(sql).fetchall()
        con2.close()
        con.execute(
            "CREATE OR REPLACE TEMP TABLE vf_der (media_id BIGINT, "
            "frame_idx INT, n_frames INT, width INT, height INT, "
            "frame_luma BIGINT)")
        con.executemany("INSERT INTO vf_der VALUES (?, ?, ?, ?, ?, ?)",
                        derived)
        nbad, nder = con.execute("""
            SELECT count(*) FILTER (s.frame_luma != d.frame_luma), count(*)
            FROM vf_der d JOIN vf_s_raw s
              ON s.media_id = d.media_id AND s.frame_idx = d.frame_idx
            """).fetchone()
        nslice = con.execute(
            "SELECT count(*) FROM vf_der").fetchone()[0]
        if nbad or nder != nslice:
            rec["err"] = (f"luma slice: {nbad} mismatched of {nder} joined "
                          f"({nslice} derived)")
            rec["hash_match"] = False
            return rec
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("vf_s_raw", "vf_der"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_image_compare(con, name, sf_dir, out_dir):
    """Bounded dedup_image / dedup_image_incremental oracle (module
    docstring): slice hash re-derivation + exact group-level keep rule
    for all rows + id-set coverage."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        full = glob.glob(f"{out_dir}/dedup_image/*.parquet")
        if not files or not full:
            rec["err"] = "no spark output (needs dedup_image dump for hashes)"
            return rec
        # img_-prefixed TEMP TABLES: a temp table named s_raw would
        # SHADOW the generic compare()'s s_raw VIEW for every later key
        # (temp schema resolves first) - the corrupted-sweep bug this
        # comment guards against; all three are dropped in finally
        con.execute("CREATE OR REPLACE TEMP TABLE img_s_raw AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        # eng = the full per-image hash table (dedup_image dumps one
        # row per png image); the incremental key reuses it as its
        # hash source — its own dump holds only batch survivors
        con.execute("CREATE OR REPLACE TEMP TABLE img_eng AS "
                    "SELECT media_id, dhash_hi, dhash_lo FROM "
                    f"read_parquet('{full[0]}')")
        rec["spark_rows"] = con.execute("SELECT count(*) FROM img_s_raw").fetchone()[0]

        # (3) coverage: eng's id set == every png id in documents
        miss, extra = con.execute(
            f"""SELECT
              (SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')
               WHERE doc_id % 3 = 0
                 AND doc_id NOT IN (SELECT media_id FROM img_eng)),
              (SELECT count(*) FROM img_eng
               WHERE media_id NOT IN (
                 SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
                 WHERE doc_id % 3 = 0))""").fetchone()
        if miss or extra:
            rec["err"] = f"id coverage: {miss} missing, {extra} extra pngs"
            rec["hash_match"] = False
            return rec

        # (2) exact keep rule for ALL rows at hash-group granularity
        if name == "dedup_image":
            bad = con.execute(f"""
              WITH {GRP_CTES},
              exp AS (
                SELECT e.media_id, e.dhash_hi, e.dhash_lo,
                  least(e.media_id, coalesce(least(
                    coalesce(p.nbmin, own), coalesce(own, p.nbmin)),
                    e.media_id)) AS keep_id
                FROM (SELECT e.*, CASE WHEN e.media_id > g.mn THEN g.mn
                                       WHEN g.c > 1 THEN g.mn2 END AS own
                      FROM img_eng e JOIN grp g
                        ON e.dhash_hi = g.dhash_hi AND e.dhash_lo = g.dhash_lo) e
                LEFT JOIN gp p
                  ON e.dhash_hi = p.dhash_hi AND e.dhash_lo = p.dhash_lo)
              SELECT (SELECT count(*) FROM (SELECT * FROM img_s_raw EXCEPT ALL
                                            SELECT * FROM exp)),
                     (SELECT count(*) FROM (SELECT * FROM exp EXCEPT ALL
                                            SELECT * FROM img_s_raw)),
                     (SELECT count(*) FROM exp)""").fetchone()
            rec["oracle_rows"] = bad[2]
        else:  # dedup_image_incremental: hist < 250, batch survivors
            bad = con.execute(f"""
              WITH {GRP_CTES},
              histg AS (SELECT DISTINCT dhash_hi, dhash_lo FROM img_eng
                        WHERE media_id < 250),
              hit AS (SELECT DISTINCT b.dhash_hi, b.dhash_lo
                      FROM grp b JOIN histg h
                        ON bit_count(xor(b.dhash_hi, h.dhash_hi)) +
                           bit_count(xor(b.dhash_lo, h.dhash_lo)) <= 10),
              clean AS (SELECT e.* FROM img_eng e
                        WHERE e.media_id >= 250
                          AND NOT EXISTS (SELECT 1 FROM hit h
                                          WHERE h.dhash_hi = e.dhash_hi
                                            AND h.dhash_lo = e.dhash_lo)),
              cgrp AS (SELECT dhash_hi, dhash_lo, min(media_id) AS mn
                       FROM clean GROUP BY 1, 2),
              cdom AS (SELECT a.dhash_hi, a.dhash_lo, min(b.mn) AS nbmin
                       FROM cgrp a JOIN cgrp b
                         ON (a.dhash_hi != b.dhash_hi OR a.dhash_lo != b.dhash_lo)
                        AND bit_count(xor(a.dhash_hi, b.dhash_hi)) +
                            bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 10
                       GROUP BY 1, 2),
              exp AS (SELECT c.media_id, c.dhash_hi, c.dhash_lo
                      FROM clean c
                      JOIN cgrp g ON c.dhash_hi = g.dhash_hi
                                 AND c.dhash_lo = g.dhash_lo
                      LEFT JOIN cdom d ON c.dhash_hi = d.dhash_hi
                                      AND c.dhash_lo = d.dhash_lo
                      WHERE c.media_id = g.mn
                        AND (d.nbmin IS NULL OR d.nbmin > c.media_id))
              SELECT (SELECT count(*) FROM (SELECT * FROM img_s_raw EXCEPT ALL
                                            SELECT * FROM exp)),
                     (SELECT count(*) FROM (SELECT * FROM exp EXCEPT ALL
                                            SELECT * FROM img_s_raw)),
                     (SELECT count(*) FROM exp)""").fetchone()
            rec["oracle_rows"] = bad[2]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = True
        if bad[0] or bad[1]:
            rec["err"] = (f"keep-rule diff: {bad[0]} spark-only, "
                          f"{bad[1]} oracle-only rows")
            rec["hash_match"] = False
            return rec

        # (1) slice hash re-derivation — dedup_image carries it for
        # both keys (one shared eng hash table); re-deriving the same
        # slice twice would double the cost for zero extra coverage
        if name == "dedup_image":
            n_png = con.execute("SELECT count(*) FROM img_eng").fetchone()[0]
            stride = 3 * max(1, n_png // 2000)
            ids = [r[0] for r in con.execute(
                f"""SELECT mn FROM (SELECT min(media_id) AS mn FROM img_eng
                                    GROUP BY dhash_hi, dhash_lo)
                    UNION SELECT media_id FROM img_eng
                    WHERE media_id % {stride} = 0""").fetchall()]
            rec["notes"].append(
                f"slice: {len(ids)} of {n_png} pngs (all hash-group reps "
                f"+ every {stride}th id) re-derived per-pixel")
            con2 = duckdb.connect()
            con2.execute(
                f"""CREATE VIEW documents AS
                    SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
                    WHERE doc_id IN ({','.join(map(str, ids))})""")
            derived = con2.execute(
                f"WITH {dhash_ctes()} SELECT media_id, dhash_hi, dhash_lo "
                "FROM hash").fetchall()
            con2.close()
            con.execute("CREATE OR REPLACE TEMP TABLE img_der "
                        "(media_id BIGINT, dhash_hi BIGINT, dhash_lo BIGINT)")
            con.executemany("INSERT INTO img_der VALUES (?, ?, ?)", derived)
            nbad, nder = con.execute(
                """SELECT count(*) FILTER (e.dhash_hi != d.dhash_hi
                                           OR e.dhash_lo != d.dhash_lo),
                          count(*)
                   FROM img_der d JOIN img_eng e USING (media_id)""").fetchone()
            if nder != len(ids) or nbad:
                rec["err"] = (f"slice hash re-derivation: {nbad} mismatched "
                              f"of {nder} derived (slice {len(ids)})")
                rec["hash_match"] = False
                return rec
        else:
            rec["notes"].append("hash slice check carried by dedup_image "
                                "(shared eng hash table)")
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("img_s_raw", "img_eng", "img_der"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_knn_compare(con, name, sql, sf_dir, out_dir):
    """Bounded knn_graph oracle: the full oracle's scored CTE is
    n²·nProbe/nLists ≈ 3.6e8 rows carrying 64-float lists at sf10 —
    an oracle-side memory wall (the engine side is fine: it shuffles
    compact rows and TopKAgg-bounds the reduce). Bounded form:
    (1) the EXACT oracle restricted to a deterministic strided query
    sample (every `stride`th vec_id, ≥2000 queries) — candidate
    generation, ranking and tie-breaks identical, compared row-for-row
    against the engine's output for those queries; (2) structural
    checks on the FULL engine output: k rows per vector for every
    corpus vector, no self-edges. The full oracle stays pinned at
    sf0.01/sf0.1 (driver gate)."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            rec["err"] = "no spark output"
            return rec
        con.execute("CREATE OR REPLACE TEMP TABLE knn_s_raw AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM knn_s_raw").fetchone()[0]
        n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
        # (2) structural: exactly 5 edges per corpus vector, no self
        full_bad = con.execute(
            """SELECT
              (SELECT count(*) FROM (
                 SELECT q_id FROM knn_s_raw GROUP BY q_id
                 HAVING count(*) != 5 OR min(rank) != 1 OR max(rank) != 5)),
              (SELECT count(*) FROM knn_s_raw WHERE q_id = vec_id),
              (SELECT count(DISTINCT q_id) FROM knn_s_raw)""").fetchone()
        if full_bad[0] or full_bad[1] or full_bad[2] != n:
            rec["err"] = (f"structure: {full_bad[0]} malformed query groups, "
                          f"{full_bad[1]} self-edges, "
                          f"{full_bad[2]}/{n} vectors covered")
            rec["hash_match"] = False
            return rec
        # (1) exact oracle on the strided sample. NOT the driver
        # oracle's text: its full-corpus row_number window over the
        # n·nLists ranking rows spilled DuckDB past the disk at sf10.
        # The list ASSIGNMENT here is the same (cos desc, pid desc)
        # argmax via max_by aggregation (hash agg, no window sort);
        # the probe window runs over the strided sample only.
        stride = max(1, n // 2000)
        if "md5('ivf:'" not in sql or "rn <= 4" not in sql:
            rec["err"] = "oracle SQL shape changed; update bounded_knn_compare"
            rec["hash_match"] = False
            return rec
        # pivots + assignment as TEMP TABLES, assignment built in
        # CHUNKS of ~1e8 cross-join rows: the one-statement n x nLists
        # cross join (2.8e9 rows at sf100) materialized past every
        # memory guard duckdb offers and drew the host OOM killer at
        # 130 GB RSS; per-chunk the pipeline stays bounded and the
        # result is row-identical (hash-agg per vec_id is chunk-local
        # because chunks partition vec_id)
        import math as _math
        nlists = max(16, _math.ceil(_math.sqrt(n)))
        con.execute("""CREATE OR REPLACE TEMP TABLE knn_piv AS
            SELECT vec_id AS pid, embedding AS pvec
            FROM embeddings
            QUALIFY row_number() OVER (
                ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id)
              <= GREATEST(16, CAST(ceil(sqrt(
                   (SELECT count(*) FROM embeddings))) AS BIGINT))""")
        chunks = max(1, (n * nlists) // 100_000_000)
        con.execute("CREATE OR REPLACE TEMP TABLE knn_lists "
                    "(vec_id BIGINT, pid BIGINT)")
        for ci in range(chunks):
            con.execute(f"""INSERT INTO knn_lists
              SELECT c.vec_id,
                     CAST(max(
                       [list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                               CAST(p.pvec AS DOUBLE[])),
                        CAST(p.pid AS DOUBLE)])[2] AS BIGINT) AS pid
              FROM embeddings c CROSS JOIN knn_piv p
              WHERE c.vec_id % {chunks} = {ci}
              GROUP BY c.vec_id""")
        if chunks > 1:
            rec["notes"].append(f"assignment built in {chunks} chunks")
        ssql = f"""
          WITH qr AS (
            SELECT c.vec_id, p.pid,
                   row_number() OVER (PARTITION BY c.vec_id
                     ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                     CAST(p.pvec AS DOUBLE[])) DESC,
                              p.pid DESC) AS rn
            FROM embeddings c CROSS JOIN knn_piv p
            WHERE c.vec_id % {stride} = 0),
          qprobe AS (SELECT vec_id AS q_id, pid FROM qr WHERE rn <= 4),
          scored AS (
            SELECT qp.q_id, l.vec_id,
                   list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])) AS cos
            FROM qprobe qp
            JOIN knn_lists l USING (pid)
            JOIN embeddings c ON c.vec_id = l.vec_id
            JOIN embeddings q ON q.vec_id = qp.q_id
            WHERE l.vec_id <> qp.q_id),
          ranked AS (
            SELECT q_id, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rank
            FROM scored)
          SELECT q_id, rank, vec_id, round(cos, 6) AS cos
          FROM ranked WHERE rank <= 5"""
        con.execute(f"CREATE OR REPLACE TEMP TABLE knn_o AS ({ssql})")
        rec["oracle_rows"] = con.execute(
            "SELECT count(*) FROM knn_o").fetchone()[0]
        rec["notes"].append(
            f"sample: every {stride}th vec_id "
            f"({rec['oracle_rows']} of {rec['spark_rows']} edges exact)")
        a, b = con.execute(f"""SELECT
          (SELECT count(*) FROM (
             SELECT q_id, rank, vec_id, printf('%.10g', cos) FROM knn_s_raw
             WHERE q_id % {stride} = 0
             EXCEPT ALL
             SELECT q_id, rank, vec_id, printf('%.10g', cos) FROM knn_o)),
          (SELECT count(*) FROM (
             SELECT q_id, rank, vec_id, printf('%.10g', cos) FROM knn_o
             EXCEPT ALL
             SELECT q_id, rank, vec_id, printf('%.10g', cos) FROM knn_s_raw
             WHERE q_id % {stride} = 0))""").fetchone()
        rec["rows_match"] = True
        rec["schema_match"] = True
        if a or b:
            rec["err"] = f"sample diff: {a} spark-only, {b} oracle-only rows"
            rec["hash_match"] = False
            return rec
        rec["hash_match"] = True
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("knn_s_raw", "knn_o", "knn_piv", "knn_lists"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_knn_density_compare(con, name, out_dir):
    """Bounded knn_density oracle: the full oracle rides the full knn
    CTE chain (infeasible at sf10 — see bounded_knn_compare). Density
    and the outlier flag are EXACT integer arithmetic over the edge
    set, so re-deriving them in DuckDB from the engine's knn_graph
    dump (itself spot-verified by bounded_knn_compare) checks every
    row of knn_density with full coverage — the dedup_image pattern:
    exact rule over a spot-verified engine intermediate."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        graph = glob.glob(f"{out_dir}/knn_graph/*.parquet")
        if not files or not graph:
            rec["err"] = "no spark output (needs knn_graph dump for edges)"
            return rec
        con.execute("CREATE OR REPLACE TEMP TABLE knd_s AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM knd_s").fetchone()[0]
        con.execute(f"""CREATE OR REPLACE TEMP TABLE knd_o AS
          WITH dm AS (
            SELECT q_id AS vec_id,
                   sum(CAST(round(cos * 1e6) AS BIGINT)) AS dm
            FROM read_parquet('{graph[0]}') GROUP BY q_id),
          tot AS (SELECT sum(dm) AS tot, count(*) AS n FROM dm)
          SELECT vec_id, round(CAST(dm AS DOUBLE) / 5000000.0, 6) AS density,
                 dm * tot.n < tot.tot AS outlier
          FROM dm CROSS JOIN tot""")
        rec["oracle_rows"] = con.execute(
            "SELECT count(*) FROM knd_o").fetchone()[0]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = True
        a, b = con.execute("""SELECT
          (SELECT count(*) FROM (
             SELECT vec_id, printf('%.10g', density), outlier FROM knd_s
             EXCEPT ALL
             SELECT vec_id, printf('%.10g', density), outlier FROM knd_o)),
          (SELECT count(*) FROM (
             SELECT vec_id, printf('%.10g', density), outlier FROM knd_o
             EXCEPT ALL
             SELECT vec_id, printf('%.10g', density), outlier FROM knd_s))
          """).fetchone()
        if a or b:
            rec["err"] = f"value diff: {a} spark-only, {b} oracle-only rows"
            rec["hash_match"] = False
            return rec
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("knd_s", "knd_o"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_knn_classify_compare(con, name, out_dir):
    """Bounded knn_classify oracle: the vote and its (cnt desc, label
    asc) argmax are exact integer logic over the edge set, so
    re-deriving them from the engine's knn_graph dump (spot-verified
    by bounded_knn_compare) + the embeddings labels checks every row
    with full coverage — the knn_density pattern."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        graph = glob.glob(f"{out_dir}/knn_graph/*.parquet")
        if not files or not graph:
            rec["err"] = "no spark output (needs knn_graph dump for edges)"
            return rec
        con.execute("CREATE OR REPLACE TEMP TABLE knc_s AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM knc_s").fetchone()[0]
        con.execute(f"""CREATE OR REPLACE TEMP TABLE knc_o AS
          WITH v AS (
            SELECT k.q_id, e.label, count(*) AS cnt
            FROM read_parquet('{graph[0]}') k
            JOIN embeddings e ON e.vec_id = k.vec_id
            GROUP BY k.q_id, e.label),
          p AS (
            SELECT q_id AS vec_id, label AS pred_label,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cnt DESC, label) AS rk
            FROM v)
          SELECT p.vec_id, e.label, p.pred_label,
                 e.label = p.pred_label AS correct
          FROM p JOIN embeddings e ON e.vec_id = p.vec_id
          WHERE p.rk = 1""")
        rec["oracle_rows"] = con.execute(
            "SELECT count(*) FROM knc_o").fetchone()[0]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = True
        a, b = con.execute("""SELECT
          (SELECT count(*) FROM (SELECT * FROM knc_s EXCEPT ALL SELECT * FROM knc_o)),
          (SELECT count(*) FROM (SELECT * FROM knc_o EXCEPT ALL SELECT * FROM knc_s))
          """).fetchone()
        if a or b:
            rec["err"] = f"value diff: {a} spark-only, {b} oracle-only rows"
            rec["hash_match"] = False
            return rec
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("knc_s", "knc_o"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_semantic_clusters_compare(con, name, out_dir):
    """Bounded semantic_clusters oracle: the full oracle's recursive
    reachability closure is O(Σ component²) rows — a memory wall if
    sf10 grows a large component. Bounded form: derive the EXACT
    mutual edge set from the engine's knn_graph dump (spot-verified by
    bounded_knn_compare), then run min-label propagation to FIXPOINT
    in DuckDB (O(diameter) passes over the edge list, never a closure
    enumeration) and compare the full labeling + sizes row-for-row —
    full coverage, both over- and under-merge detected."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        graph = glob.glob(f"{out_dir}/knn_graph/*.parquet")
        if not files or not graph:
            rec["err"] = "no spark output (needs knn_graph dump for edges)"
            return rec
        con.execute("CREATE OR REPLACE TEMP TABLE smc_s AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM smc_s").fetchone()[0]
        con.execute(f"""CREATE OR REPLACE TEMP TABLE smc_ed AS
          WITH ed AS (
            SELECT q_id AS x, vec_id AS y
            FROM read_parquet('{graph[0]}') WHERE cos >= 0.3)
          SELECT a.x AS a, a.y AS b
          FROM ed a JOIN ed b ON a.x = b.y AND a.y = b.x
          WHERE a.x < a.y""")
        con.execute("""CREATE OR REPLACE TEMP TABLE smc_sym AS
          SELECT a, b FROM smc_ed UNION SELECT b, a FROM smc_ed""")
        con.execute("""CREATE OR REPLACE TEMP TABLE smc_l AS
          SELECT vec_id AS id, vec_id AS lbl FROM embeddings""")
        for i in range(200):
            con.execute("""CREATE OR REPLACE TEMP TABLE smc_n AS
              SELECT l.id, least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
              FROM smc_l l
              LEFT JOIN smc_sym s ON s.b = l.id
              LEFT JOIN smc_l nl ON nl.id = s.a
              GROUP BY l.id, l.lbl""")
            changed = con.execute("""SELECT count(*) FROM smc_n n
              JOIN smc_l l USING (id) WHERE n.lbl <> l.lbl""").fetchone()[0]
            con.execute("CREATE OR REPLACE TEMP TABLE smc_l AS "
                        "SELECT * FROM smc_n")
            if changed == 0:
                break
        else:
            rec["err"] = "label propagation did not converge in 200 rounds"
            rec["hash_match"] = False
            return rec
        con.execute("""CREATE OR REPLACE TEMP TABLE smc_o AS
          WITH sz AS (SELECT lbl, count(*) AS cluster_size
                      FROM smc_l GROUP BY lbl)
          SELECT l.id AS vec_id, l.lbl AS cluster, sz.cluster_size
          FROM smc_l l JOIN sz USING (lbl)""")
        rec["oracle_rows"] = con.execute(
            "SELECT count(*) FROM smc_o").fetchone()[0]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = True
        a, b = con.execute("""SELECT
          (SELECT count(*) FROM (SELECT * FROM smc_s EXCEPT ALL SELECT * FROM smc_o)),
          (SELECT count(*) FROM (SELECT * FROM smc_o EXCEPT ALL SELECT * FROM smc_s))
          """).fetchone()
        if a or b:
            rec["err"] = f"value diff: {a} spark-only, {b} oracle-only rows"
            rec["hash_match"] = False
            return rec
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("smc_s", "smc_ed", "smc_sym", "smc_l", "smc_n", "smc_o"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_knn_hubness_compare(con, name, out_dir):
    """Bounded knn_hubness oracle: in-degree is an exact count over
    the edge set — re-derived in full from the engine's knn_graph dump
    (spot-verified by bounded_knn_compare), zero rows via LEFT join."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        graph = glob.glob(f"{out_dir}/knn_graph/*.parquet")
        if not files or not graph:
            rec["err"] = "no spark output (needs knn_graph dump for edges)"
            return rec
        con.execute("CREATE OR REPLACE TEMP TABLE hub_s AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM hub_s").fetchone()[0]
        con.execute(f"""CREATE OR REPLACE TEMP TABLE hub_o AS
          WITH ind AS (
            SELECT vec_id, CAST(count(*) AS BIGINT) AS in_degree
            FROM read_parquet('{graph[0]}') GROUP BY vec_id)
          SELECT e.vec_id, coalesce(i.in_degree, 0) AS in_degree,
                 coalesce(i.in_degree, 0) > 10 AS hub,
                 coalesce(i.in_degree, 0) = 0 AS antihub
          FROM embeddings e LEFT JOIN ind i USING (vec_id)""")
        rec["oracle_rows"] = con.execute(
            "SELECT count(*) FROM hub_o").fetchone()[0]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = True
        a, b = con.execute("""SELECT
          (SELECT count(*) FROM (SELECT * FROM hub_s EXCEPT ALL SELECT * FROM hub_o)),
          (SELECT count(*) FROM (SELECT * FROM hub_o EXCEPT ALL SELECT * FROM hub_s))
          """).fetchone()
        if a or b:
            rec["err"] = f"value diff: {a} spark-only, {b} oracle-only rows"
            rec["hash_match"] = False
            return rec
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("hub_s", "hub_o"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def bounded_pagerank_compare(con, name, out_dir):
    """Bounded pagerank oracle: the full oracle rides the full knn CTE
    chain (infeasible at sf10 — see bounded_knn_compare). PageRank on
    the mutual edge set is EXACT integer arithmetic, so re-running the
    10 unrolled power-iteration rounds in DuckDB from the engine's
    knn_graph dump (spot-verified by bounded_knn_compare) checks every
    row with full coverage."""
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "notes": ["bounded oracle (see tools/sweep_sf10.py docstring)"]}
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        graph = glob.glob(f"{out_dir}/knn_graph/*.parquet")
        if not files or not graph:
            rec["err"] = "no spark output (needs knn_graph dump for edges)"
            return rec
        con.execute("CREATE OR REPLACE TEMP TABLE pr_s AS "
                    f"SELECT * FROM read_parquet('{files[0]}')")
        rec["spark_rows"] = con.execute(
            "SELECT count(*) FROM pr_s").fetchone()[0]
        scale = 1000000000000
        rounds = ",\n".join(f"""r{k} AS (
            SELECT e2.vec_id AS id,
                   CAST(t.t + coalesce(c.c, 0) AS BIGINT) AS r
            FROM embeddings e2 CROSS JOIN tele t
            LEFT JOIN (
              SELECT s.b AS id,
                     CAST(sum((85 * r.r) // (100 * d.deg)) AS BIGINT) AS c
              FROM sym s JOIN r{k - 1} r ON r.id = s.a
              JOIN deg d ON d.id = s.a
              GROUP BY s.b) c ON c.id = e2.vec_id)""" for k in range(1, 11))
        con.execute(f"""CREATE OR REPLACE TEMP TABLE pr_o AS
          WITH ed AS MATERIALIZED (
            SELECT q_id AS x, vec_id AS y
            FROM read_parquet('{graph[0]}') WHERE cos >= 0.3),
          mut AS MATERIALIZED (
            SELECT a.x AS a, a.y AS b
            FROM ed a JOIN ed b ON a.x = b.y AND a.y = b.x
            WHERE a.x < a.y),
          sym AS (SELECT a, b FROM mut UNION SELECT b AS a, a AS b FROM mut),
          deg AS MATERIALIZED (
            SELECT a AS id, CAST(count(*) AS BIGINT) AS deg
            FROM sym GROUP BY a),
          tele AS (SELECT (15 * {scale}) // (100 * count(*)) AS t
                   FROM embeddings),
          r0 AS (SELECT vec_id AS id,
                 (SELECT {scale} // count(*) FROM embeddings) AS r
                 FROM embeddings),
          {rounds}
          SELECT id AS vec_id, r AS pr_micro,
                 round(CAST(r AS DOUBLE) / {scale}, 6) AS pagerank
          FROM r10""")
        rec["oracle_rows"] = con.execute(
            "SELECT count(*) FROM pr_o").fetchone()[0]
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = True
        a, b = con.execute("""SELECT
          (SELECT count(*) FROM (
             SELECT vec_id, pr_micro, printf('%.10g', pagerank) FROM pr_s
             EXCEPT ALL
             SELECT vec_id, pr_micro, printf('%.10g', pagerank) FROM pr_o)),
          (SELECT count(*) FROM (
             SELECT vec_id, pr_micro, printf('%.10g', pagerank) FROM pr_o
             EXCEPT ALL
             SELECT vec_id, pr_micro, printf('%.10g', pagerank) FROM pr_s))
          """).fetchone()
        if a or b:
            rec["err"] = f"value diff: {a} spark-only, {b} oracle-only rows"
            rec["hash_match"] = False
            return rec
        rec["hash_match"] = bool(rec["rows_match"])
    except Exception:
        rec["err"] = traceback.format_exc()[-400:]
        rec["hash_match"] = False
    finally:
        for t in ("pr_s", "pr_o"):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        rec["secs"] = round(time.time() - t0, 1)
    return rec


def _split_ctes(sql):
    """Split a `WITH a AS [MATERIALIZED] (...), b AS (...) SELECT ...`
    statement into ([(name, body), ...], final_select) by paren-depth
    scan (single-quoted literals skipped). Used by the staged ivfpq
    compare so the STAGED plan runs the committed oracle's own CTE
    text verbatim — the video_dhash_ctes no-drift convention."""
    s = sql.strip()
    assert re.match(r"WITH\b", s, re.I), "oracle does not start with WITH"
    i, ctes = 4, []
    while True:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+"
                     r"(?:MATERIALIZED\s+)?\(", s[i:], re.I)
        assert m, f"CTE parse failed at {s[i:i + 60]!r}"
        name, j, depth = m.group(1), i + m.end(), 1
        while depth:
            c = s[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "'":
                j += 1
                while s[j] != "'":
                    j += 1
            j += 1
        ctes.append((name, s[i + m.end():j - 1]))
        m2 = re.match(r"\s*,", s[j:])
        if not m2:
            return ctes, s[j:].strip()
        i = j + m2.end()


# the three scoring stages chunked by staged_ivfpq_compare, mapped to
# the consumer CTE that folds each into its per-vector argmax
IVFPQ_CHUNKED = {"a1": "s1", "a2": "s2", "codes": "s3"}


def staged_ivfpq_compare(con, name, sql, out_dir, chunks=16):
    """Staged ann_ivfpq oracle for corpora past IVFPQ_FULL_MAX_VECS.

    The committed oracle is one WITH-chain whose three PQ-assignment
    scoring stages (s1/s2/s3 = vsub ⋈ codebook: n·16 subvectors × 16
    codes = 512M rows at sf100) are each MATERIALIZED under a
    (vec_id, mi) ranking window — DuckDB's working set for the
    monolithic plan exceeded 100 GB RAM + 59 GB spill disk (measured
    twice, r16). This runs the SAME statement decomposed: every CTE
    body (parsed verbatim from the committed SQL by _split_ctes — no
    re-derivation, no drift) becomes a TEMP TABLE in dependency
    order, except s1/s2/s3 which become per-chunk TEMP VIEWs filtered
    `vec_id % chunks = i`; their consumers (a1/a2/codes — the
    per-vector argmaxes) accumulate by INSERT. The chunk filter is on
    the scoring window's own PARTITION BY key, so every partition is
    complete within its chunk and the union over disjoint chunks is
    exactly the unchunked result; peak working set divides by
    `chunks`. The final SELECT then runs over the staged tables and
    the standard compare() machinery checks it against the engine
    parquet unchanged. Below the gate the one-shot oracle runs as
    committed (sf0.01/sf0.1 via the driver, sf1/sf10 via this sweep).
    """
    t0 = time.time()
    ctes, final = _split_ctes(sql)
    bodies = dict(ctes)
    order = [n for n, _ in ctes]
    assert set(IVFPQ_CHUNKED) | set(IVFPQ_CHUNKED.values()) <= set(order), \
        f"expected CTEs {sorted(IVFPQ_CHUNKED)} + scoring stages in {order}"
    made = []
    try:
        for nm in order:
            if nm in IVFPQ_CHUNKED.values():
                continue  # consumed per-chunk by its argmax CTE below
            if nm in IVFPQ_CHUNKED:
                src = IVFPQ_CHUNKED[nm]
                for i in range(chunks):
                    con.execute(
                        f"CREATE OR REPLACE TEMP VIEW {src} AS "
                        f"SELECT * FROM ({bodies[src]}) "
                        f"WHERE vec_id % {chunks} = {i}")
                    if i == 0:
                        con.execute(
                            f"CREATE OR REPLACE TEMP TABLE {nm} AS {bodies[nm]}")
                        made.append(nm)
                    else:
                        con.execute(f"INSERT INTO {nm} {bodies[nm]}")
                con.execute(f"DROP VIEW IF EXISTS {src}")
            else:
                con.execute(
                    f"CREATE OR REPLACE TEMP TABLE {nm} AS {bodies[nm]}")
                made.append(nm)
        con.execute(f"CREATE OR REPLACE TEMP TABLE ivfpq_staged AS {final}")
        made.append("ivfpq_staged")
        rec = compare(con, name, "SELECT * FROM ivfpq_staged", out_dir)
        rec.setdefault("notes", []).append(
            f"staged oracle: committed CTE bodies as temp tables, "
            f"s1/s2/s3 scoring chunked vec_id%{chunks} (see "
            f"staged_ivfpq_compare docstring)")
        # compare() timed only the final 40-row check; report the
        # whole staged derivation so the record reads honestly
        rec["secs"] = round(time.time() - t0, 1)
    finally:
        for t in reversed(made):
            try:
                con.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
    return rec


def fresh_con(sf_dir):
    """One connection PER KEY: a heavy oracle that dies mid-allocation
    (the r11 text_dsir sf10 OOM under transient host memory pressure)
    must not poison every later key's compare on a shared connection.
    Bounded memory + a spill dir make DuckDB go out-of-core instead of
    aborting when the host is busy. GRAFT_DUCK_MEM overrides the 24GB
    default for single-key re-runs that profit from more RAM (the r16
    ann_ivfpq sf100 monolithic compare exhausted RAM+disk even at
    100GB — that key now routes to staged_ivfpq_compare instead; the
    knob stays for ad-hoc heavy re-runs)."""
    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '24GB')}'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir, out_dir, out_json, only=()):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # subset re-runs MERGE into an existing record (recompute summary)
    # instead of clobbering it with a partial file
    results = {}
    if only and os.path.exists(out_json):
        results = {k: v for k, v in json.load(open(out_json)).items()
                   if k != "_summary" and k in oracles}
    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    video_bounded = n_docs > VIDEO_FULL_MAX_DOCS
    n_vecs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    ivfpq_staged = n_vecs > IVFPQ_FULL_MAX_VECS
    for name in sorted(oracles):
        if only and name not in only:
            continue
        con = fresh_con(sf_dir)
        try:
            if name in BOUNDED_IMAGE:
                rec = bounded_image_compare(con, name, sf_dir, out_dir)
            elif name in BOUNDED_VIDEO and video_bounded:
                rec = bounded_video_compare(con, name, sf_dir, out_dir)
            elif name == "mm_video_frames" and video_bounded:
                rec = bounded_video_frames_compare(con, name, oracles[name],
                                                   sf_dir, out_dir)
            elif name == "ann_ivfpq" and ivfpq_staged:
                rec = staged_ivfpq_compare(con, name, oracles[name],
                                           out_dir)
            elif name == "knn_graph":
                rec = bounded_knn_compare(con, name, oracles[name],
                                          sf_dir, out_dir)
            elif name == "knn_density":
                rec = bounded_knn_density_compare(con, name, out_dir)
            elif name == "knn_classify":
                rec = bounded_knn_classify_compare(con, name, out_dir)
            elif name == "semantic_clusters":
                rec = bounded_semantic_clusters_compare(con, name, out_dir)
            elif name == "knn_hubness":
                rec = bounded_knn_hubness_compare(con, name, out_dir)
            elif name == "pagerank":
                rec = bounded_pagerank_compare(con, name, out_dir)
            else:
                rec = compare(con, name, oracles[name], out_dir)
        finally:
            con.close()
        results[name] = rec
        status = "ok" if rec.get("hash_match") else "FAIL"
        print(f"{status:4s} {name} rows={rec['spark_rows']} ({rec.get('secs', 0)}s)"
              + (f" err={rec['err'][-140:]}" if rec.get("err") else "")
              + (f" notes={rec['notes']}" if rec.get("notes") else ""), flush=True)
    # a merged record may carry either schema: this sweep's
    # hash_match records or check_oracle's {"ok": true} records
    ok = sum(1 for r in results.values()
             if r.get("hash_match") or r.get("ok"))
    sk = sum(1 for r in results.values() if "skip" in r)
    bad = len(results) - ok - sk
    # stamp the record with its generating code revision + wall time so
    # tier records never carry stale provenance (r13 verdict item 7)
    try:
        rev = subprocess.run(["git", "-C", os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True).stdout.strip()
    except Exception:
        rev = "unknown"
    summary = {"sf_dir": sf_dir, "green": ok, "skipped": sk, "failed": bad,
               "oracled_total": len(results), "code_rev": rev,
               "generated": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(json.dumps(summary), flush=True)
    json.dump({"_summary": summary,
               **{k: results[k] for k in sorted(results)}},
              open(out_json, "w"), indent=1)
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], sys.argv[3],
                       set(sys.argv[4:])) else 0)
