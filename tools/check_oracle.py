#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run DuckDB oracle SQL from
outDir/oracle_sql.json against the sf parquet tables and compare with the
Spark parquet dumps written by graft.Verify. Columns are sorted by name and
rows canonicalized before hashing, like the driver."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{outdir}/{name}"
    files = glob.glob(f"{spark_path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    sdf = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
    # canonicalize: sort columns by name, sort rows by all columns
    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    try:
        o, s = canon(odf), canon(sdf)
    except Exception as e:
        print(f"FAIL {name}: canon error {e}"); fails += 1; continue
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: cols oracle={list(o.columns)} spark={list(s.columns)}")
        fails += 1; continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}"); fails += 1; continue
    if not o.equals(s):
        neq = (o != s) & ~(o.isna() & s.isna())
        bad = neq.any(axis=0)
        print(f"FAIL {name}: value mismatch in cols {list(o.columns[bad])}")
        for c in o.columns[bad][:2]:
            m = neq[c]
            print("  oracle:", o.loc[m, c].head(3).tolist())
            print("  spark :", s.loc[m, c].head(3).tolist())
        fails += 1; continue
    print(f"OK   {name}: {len(o)} rows")
print(f"{'ALL OK' if fails==0 else str(fails)+' FAILURES'}")
sys.exit(1 if fails else 0)
