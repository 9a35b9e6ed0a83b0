#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare:
loads each SparkEntry verify output parquet, runs the paired oracle SQL in
DuckDB over the same source tables, sorts columns by name and rows by value,
and diffs. Usage: check_oracles.py <sfDir> <verifyOutDir>"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for q, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = pd.read_parquet(f"{out_dir}/{q}")
    except Exception as e:
        bad.append((q, f"ERROR {e}"))
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        bad.append((q, f"schema: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    def canon(df):
        return sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    ce, cg = canon(exp), canon(got)
    if ce == cg:
        ok.append(q)
    else:
        miss = [r for r in ce if r not in set(cg)][:3]
        extra = [r for r in cg if r not in set(ce)][:3]
        bad.append((q, f"rows: oracle={len(ce)} spark={len(cg)} missing={miss} extra={extra}"))

print(f"OK ({len(ok)}): {' '.join(ok)}")
for q, why in bad:
    print(f"MISMATCH {q}: {why}")
sys.exit(1 if bad else 0)
