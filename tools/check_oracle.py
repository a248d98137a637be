#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle compare.

For each query dir under OUT_DIR: load the Spark parquet result, run the
oracle SQL (from oracle_sql.json) in DuckDB against the sf parquet
tables, sort columns by name, canonicalize values, and hash-compare.

Usage: check_oracle.py <sf_dir> <verify_out_dir> [skip,list]

The optional third arg names queries to skip (comma-separated) — used
at sf1 where an oracle itself is quadratic (dedup_embed: all-pairs
cosine over 20k vectors) even though the engine side is not.
"""
import json, sys, math, glob, time
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, sorted(tuple(canon(v) for v in row) for row in zip(*data)) if data else (cols, [])

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if name in skip:
            print(f"skip {name}", flush=True)
            continue
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True)
            n_bad += 1
            continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck_tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}", flush=True)
            n_bad += 1
            continue
        sc, srows = table_rows(spark_tbl)
        dc, drows = table_rows(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: cols spark={sc} duck={dc}", flush=True)
            n_bad += 1
        elif srows != drows:
            n_bad += 1
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows; first diffs: {diff}", flush=True)
        else:
            n_ok += 1
            print(f"ok   {name} ({len(srows)} rows, {time.time() - t0:.1f}s)", flush=True)
    print(f"== {n_ok} ok, {n_bad} fail", flush=True)
    return 1 if n_bad else 0

if __name__ == "__main__":
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
