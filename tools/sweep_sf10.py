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

Usage: sweep_sf10.py <sf10_dir> <verify_out_dir> <out_json> [names...]
"""
import json, sys, glob, time, traceback
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# compare-side skips: the ENGINE ran every query in the verify dump;
# these are oracle-side cost walls, each pinned at the largest tier it
# does pass (sf1 = 83/83 green, round 7).
SKIPS = {
    "dedup_image": "oracle re-derives every hash bit from per-pixel "
        "arithmetic - O(total pixels) ~ 4e9 rows at 166k images; "
        "oracle-pinned at sf0.01/sf0.1, engine sf10-verified via the "
        "collapsed hash dump (SURVEY s8 round 10)",
    "dedup_image_incremental": "same DhashCtes per-pixel re-derivation "
        "as dedup_image (one shared definition) - O(total pixels) at "
        "sf10; oracle-pinned at sf0.01/sf0.1, engine sf10-verified in "
        "the dump",
}

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


def main(sf_dir, out_dir, out_json, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        if name in SKIPS:
            results[name] = {"skip": SKIPS[name]}
            print(f"skip {name}", flush=True)
            continue
        rec = compare(con, name, oracles[name], out_dir)
        results[name] = rec
        status = "ok" if rec.get("hash_match") else "FAIL"
        print(f"{status:4s} {name} rows={rec['spark_rows']} ({rec.get('secs', 0)}s)"
              + (f" err={rec['err'][-140:]}" if rec.get("err") else "")
              + (f" notes={rec['notes']}" if rec.get("notes") else ""), flush=True)
    ok = sum(1 for r in results.values() if r.get("hash_match"))
    sk = sum(1 for r in results.values() if "skip" in r)
    bad = len(results) - ok - sk
    summary = {"sf_dir": sf_dir, "green": ok, "skipped": sk, "failed": bad,
               "oracled_total": len(results)}
    print(json.dumps(summary), flush=True)
    json.dump({"_summary": summary, **results}, open(out_json, "w"), indent=1)
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], sys.argv[3],
                       set(sys.argv[4:])) else 0)
