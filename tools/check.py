#!/usr/bin/env python3
"""Local driver-mimic: compare Verify.scala's parquet dumps against the
DuckDB oracle (sorts columns by name, then hashes values) so oracle parity
is validated before the driver runs. Usage:
    python3 tools/check.py [sfdir] [outdir]
(Expects Verify to have been run already: sbt "runMain graft.Verify <sfdir> <outdir>")
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

# Iterate over the FULL query manifest (not just output dirs that exist):
# a query that crashed in Verify writes no dir and must count as a failure.
try:
    manifest = json.load(open(f"{outdir}/queries.json"))
except FileNotFoundError:
    manifest = sorted(set(list(oracles) + [os.path.basename(d.rstrip("/")) for d in glob.glob(f"{outdir}/*/")]))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints and floats
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in manifest:
    d = f"{outdir}/{name}/"
    if not os.path.isdir(d):
        print(f"{name:24s} MISSING OUTPUT (query crashed in Verify?)")
        fails += 1
        continue
    spark_df = con.sql(f"SELECT * FROM '{d}*.parquet'").df()
    if name not in oracles:
        print(f"{name:24s} rows={len(spark_df):7d} (no oracle; rows-only) {'OK' if len(spark_df)>0 else 'EMPTY!'}")
        if len(spark_df) == 0: fails += 1
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"{name:24s} COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
        fails += 1
        continue
    bad = []
    for c in a.columns:
        # dtype-strict: the driver hashes typed values, so an int64 Spark
        # column vs a float64 oracle column (e.g. DuckDB sum(BIGINT) →
        # HUGEINT → float64) is a driver-hash FAIL even when pandas `==`
        # says 10596 == 10596.0. canon() already unified integer widths
        # and float widths, so any remaining dtype gap is a kind mismatch.
        if a[c].dtype != b[c].dtype:
            print(f"{name:24s} DTYPE MISMATCH col={c} spark={a[c].dtype} oracle={b[c].dtype}")
            bad.append(c)
            continue
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]):
            eq = np.array_equal(av, bv, equal_nan=True)
        else:
            eq = (pd.Series(av).fillna("\0") == pd.Series(bv).fillna("\0")).all()
        if not eq:
            bad.append(c)
    if bad:
        print(f"{name:24s} VALUE MISMATCH in {bad}")
        for c in bad[:2]:
            diff = a[c].values != b[c].values
            i = int(np.argmax(diff))
            print(f"    first diff row {i}: spark={a[c].values[i]!r} oracle={b[c].values[i]!r}")
        fails += 1
    else:
        print(f"{name:24s} rows={len(a):7d} MATCH")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
