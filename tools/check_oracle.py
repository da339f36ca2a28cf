#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read Spark's parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the raw testdata tables, sort
columns by name, compare row-by-row with exact equality (floats too — the
engine rounds anything FP-order-dependent, so exact match is the bar).
Queries with no oracle entry get a rows>0 check.

IMPORTANT asymmetry (round-5 lesson): the Spark side is read via pyarrow
(NOT DuckDB), the oracle side via DuckDB fetchdf — mirroring the driver.
Reading both sides through DuckDB coerces decimals to float64 symmetrically
and masks representation differences: 13 queries shipped "0 fail" locally in
r5 while the driver failed all 13 on DECIMAL output columns. Any DecimalType
in a Spark output parquet is now an automatic FAIL here (and is also linted
in Verify.scala) — cast certificates to VARCHAR / money to DOUBLE instead.
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    """Canonical per-column string rendering, applied identically to both
    sides. Floats render via numpy repr (bit-exact compare), decimals via
    str(Decimal) (exact digits — deliberately NOT coerced to float).
    Date-valued columns normalize away a midnight time component — gated on
    the column's TYPE (datetime64 dtype, or objects of datetime.date), never
    on string shape: shape-gating strips one side of a genuinely mismatched
    pair and turns a real failure into a false pass."""
    import datetime
    out = {}
    for c in df.columns:
        a = df[c]
        is_datetime = str(a.dtype).startswith("datetime64") or (
            a.dtype == object
            and a.map(lambda v: v is None
                      or isinstance(v, (datetime.date, datetime.datetime))).all()
            and len(a) > 0)
        try:
            sa = a.astype(str)
        except Exception:
            sa = a.map(repr)
        if is_datetime:
            sa = sa.str.replace(" 00:00:00", "", regex=False)
            sa = sa.where(sa != "NaT", "nan")
        # NULL in an object column renders 'None' via pyarrow but 'nan' via
        # fetchdf; the driver treats them as equal (q157 passes with NULLs)
        sa = sa.where(sa != "None", "nan")
        out[c] = sa
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    qdirs = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*") if "." not in d.split("/")[-1])
    n_pass = n_fail = 0
    for q in qdirs:
        files = sorted(glob.glob(f"{out_dir}/{q}/*.parquet"))
        if not files:
            print(f"FAIL {q}: no spark output"); n_fail += 1; continue
        tbl = pq.read_table(files)
        decimal_cols = [f.name for f in tbl.schema if "decimal" in str(f.type)]
        if decimal_cols:
            print(f"FAIL {q}: DECIMAL output columns {decimal_cols} — the driver's "
                  f"hasher reads these exactly while DuckDB renders float64; cast to "
                  f"VARCHAR/DOUBLE in the final select (see r5 verdict)")
            n_fail += 1; continue
        got = tbl.to_pandas()
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
        ga, ea = canon(got), canon(exp)
        mismatch = None
        for c in got.columns:
            neq = ga[c].values != ea[c].values
            if neq.any():
                i = neq.argmax()
                mismatch = (c, i, got[c].iloc[i], exp[c].iloc[i],
                            str(got[c].dtype), str(exp[c].dtype))
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
