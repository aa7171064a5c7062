#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query result
parquet in OUTDIR, run the matching oracle SQL in DuckDB over the same
testdata tables, sort columns by name + rows by value, and hash-compare.

Usage: check_oracle.py SF_DIR OUTDIR [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# data-shape fuzz draws (r13): per-query table-dir overrides — the
# oracle SQL is canonical, the DATA varies; views re-point per entry
try:
    data_dirs = json.load(open(f"{out_dir}/data_dirs.json"))
except FileNotFoundError:
    data_dirs = {}

def connect_for(name):
    ddir = data_dirs.get(name)
    if ddir is None:
        return con
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(ddir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark writes a directory of part files
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        else:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c
try:
    no_oracle_reasons = json.load(open(f"{out_dir}/no_oracle_reasons.json"))
except FileNotFoundError:
    no_oracle_reasons = {}

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    if name.endswith("__data"):  # a data-shape draw's input tables
        continue
    if only and name not in only:
        continue
    got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{path}/*.parquet")],
                    ignore_index=True)
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        want = connect_for(name).execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        fails.append((name, f"schema mismatch: got {list(g.columns)} want {list(w.columns)}"))
        continue
    if len(g) != len(w):
        fails.append((name, f"row count: got {len(g)} want {len(w)}"))
        continue
    if not g.equals(w):
        diff = (g != w)
        bad_cols = [c for c in g.columns if diff[c].any()]
        i = diff.any(axis=1).idxmax()
        fails.append((name, f"value mismatch cols={bad_cols} first at row {i}: "
                            f"got {g.iloc[i].to_dict()} want {w.iloc[i].to_dict()}"))
        continue
    passes.append((name, len(g)))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, r in skips:
    why = no_oracle_reasons.get(n, "UNDOCUMENTED — add to SparkEntry.noOracleReasons")
    print(f"SKIP {n} (rows-only, {r} rows) — {why}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
