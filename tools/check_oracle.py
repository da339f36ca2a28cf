#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read Spark's parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the raw testdata tables, sort
columns by name, compare row-by-row with exact equality (floats too — the
engine rounds anything FP-order-dependent, so exact match is the bar).
Queries with no oracle entry get a rows>0 check.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    qdirs = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*") if "." not in d.split("/")[-1])
    n_pass = n_fail = 0
    for q in qdirs:
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        if not files:
            print(f"FAIL {q}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{q}/*.parquet')").fetchdf()
        if q not in oracle:
            if len(got) > 0:
                print(f"pass {q}: rows-only ({len(got)} rows)"); n_pass += 1
            else:
                print(f"FAIL {q}: rows-only check, 0 rows"); n_fail += 1
            continue
        try:
            exp = con.execute(oracle[q]).fetchdf()
        except Exception as e:
            print(f"FAIL {q}: oracle SQL error: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {q}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {q}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                sa, sb = a.astype(str), b.astype(str)
            except Exception:
                sa, sb = a.map(repr), b.map(repr)
            neq = sa.values != sb.values
            if neq.any():
                i = neq.argmax()
                mismatch = (c, i, a.iloc[i], b.iloc[i],
                            str(a.dtype), str(b.dtype))
                break
        if mismatch:
            c, i, av, bv, at, bt = mismatch
            print(f"FAIL {q}: col {c} row {i}: spark={av!r}({at}) oracle={bv!r}({bt})")
            n_fail += 1
        else:
            print(f"pass {q}: {len(got)} rows, {len(got.columns)} cols exact")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
