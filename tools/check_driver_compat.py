#!/usr/bin/env python3
"""Driver-harness-faithful compare: pandas-based, DTYPE-SENSITIVE.

The repo's check_oracle.py stringifies values, which is weaker than the
driver's gate (round-9 lesson: equal values with decimal128-vs-int64
dtypes, or list cells pandas cannot factorize, both fail the driver).
This script mirrors the failure modes: load both sides into pandas,
sort columns by name, sort_values over all columns (raises on list
cells exactly like the driver), then compare dtype kinds and values.

Usage: check_driver_compat.py <sf_dir> <verify_out_dir> [names...]
"""
import json, sys, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in names or sorted(oracles):
        if name not in oracles:
            print(f"SKIP {name}: no oracle")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            bad += 1
            continue
        sdf = pq.read_table(files[0]).to_pandas()
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            bad += 1
            continue
        sdf = sdf[sorted(sdf.columns)]
        ddf = ddf[sorted(ddf.columns)]
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(ddf.columns)}")
            bad += 1
            continue
        try:
            # the driver's sort_values→factorize path: list cells raise here
            sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
            ddf = ddf.sort_values(list(ddf.columns)).reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: pandas sort crash (driver-harness err): {e}")
            bad += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}")
            bad += 1
            continue
        # driver-red dtype class = numeric on one side, object on the
        # other (the r9 dedup_image failure). A date/datetime column
        # that pyarrow reads as datetime64 and DuckDB's .df() hands
        # back as date objects is REPRESENTATION skew the real driver
        # accepts — CORRECTNESS_r10..r15 have the day-column keys
        # hash-green every round — so mirror that acceptance (the same
        # rule sweep_sf10.pandas_kind applies) instead of flagging a
        # standing false alarm (r16: this tool red-flagged 9 such keys
        # the driver passes).
        dt_mismatch, benign_dt = [], []
        for c in sdf.columns:
            ks, kd = sdf[c].dtype.kind, ddf[c].dtype.kind
            if ks == kd:
                continue
            if ("O" in (ks, kd)) and (ks in "iuf" or kd in "iuf"):
                dt_mismatch.append((c, str(sdf[c].dtype), str(ddf[c].dtype)))
            else:
                benign_dt.append((c, str(sdf[c].dtype), str(ddf[c].dtype)))
        if dt_mismatch:
            print(f"FAIL {name}: dtype-kind mismatch {dt_mismatch}")
            bad += 1
            continue
        neq = []
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            ka, kb = a.dtype.kind, b.dtype.kind
            if "M" in (ka, kb) and ka != kb:
                # benign date-representation pair: compare as datetimes
                # (normalized to one unit width — to_datetime yields ns
                # from date objects but keeps us from datetime64[us],
                # and pandas .equals is dtype-width-sensitive)
                a = pd.to_datetime(a).astype("datetime64[ns]")
                b = pd.to_datetime(b).astype("datetime64[ns]")
                ok = a.reset_index(drop=True).equals(b.reset_index(drop=True))
            elif ka == "f" or kb == "f":
                # the driver hashes canonical values; the sweep's canon
                # is printf('%.10g') — compare at the same 10
                # significant digits (exact float equality red-flagged
                # q1_pricing's decimal-vs-double last-ulp skew that the
                # real gate has passed since r1)
                fmt = lambda s: s.map(
                    lambda v: "NaN" if pd.isna(v) else "%.10g" % v)
                ok = fmt(a).equals(fmt(b))
            else:
                ok = a.astype(object).where(pd.notna(a), None).equals(
                    b.astype(object).where(pd.notna(b), None))
            if not ok:
                neq.append(c)
        if neq:
            print(f"FAIL {name}: value mismatch in {neq} ({len(sdf)} rows)")
            bad += 1
        else:
            note = f" [benign repr skew: {benign_dt}]" if benign_dt else ""
            print(f"ok   {name}: {len(sdf)} rows, dtypes "
                  f"{[str(sdf[c].dtype) for c in sdf.columns]}{note}")
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2], sys.argv[3:]) else 0)
