#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata tables, load the Spark parquet result, sort
columns by name + rows, and compare values. Usage:
    python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def eq(a, b):
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = ((av.isna() & bv.isna()) | (abs(av - bv) <= 1e-9 + 1e-9*abs(bv))).all()
            else:
                # None == None is False in pandas object compare; use a sentinel
                ok = (av.astype(object).where(~av.isna(), "\x00NULL") ==
                      bv.astype(object).where(~bv.isna(), "\x00NULL")).all()
        except Exception as e:
            return False, f"col {c}: compare error {e}"
        if not ok:
            bad = (av != bv)
            return False, f"col {c} mismatch, e.g. {av[bad].head(3).tolist()} vs {bv[bad].head(3).tolist()}"
    return True, ""

fails = 0
for name in sorted(oracle):
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue
    a, b = canon(spark_df), canon(duck_df)
    if sorted(a.columns) != sorted(b.columns):
        print(f"{name}: COLUMN mismatch {sorted(a.columns)} vs {sorted(b.columns)}"); fails += 1; continue
    ok, why = eq(a, b)
    # exact hash-style check too (what the driver does):
    exact = ok and all(
        (a[c].dtype == b[c].dtype) or (a[c].dtype.kind == b[c].dtype.kind)
        for c in a.columns)
    status = "OK" if ok else "FAIL"
    dt = "" if exact else "  [dtype: " + ",".join(
        f"{c}:{a[c].dtype}/{b[c].dtype}" for c in a.columns if a[c].dtype != b[c].dtype) + "]"
    print(f"{name}: {status} rows={len(a)}{dt} {why}")
    if not ok: fails += 1
sys.exit(1 if fails else 0)
