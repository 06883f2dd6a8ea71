#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB over the sfDir tables,
and compares: column names (sorted), row counts, and values (rows sorted by
all columns, NaN-safe). Exact equality required — mirrors a hash compare.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(oracle)
fails, passes, skips = [], [], []

# rows-only queries (no oracle): confirm the dump exists and is readable
import os
for d in sorted(os.listdir(out)):
    if d == "oracle_sql.json" or d in oracle:
        continue
    files = glob.glob(f"{out}/{d}/*.parquet")
    if not files:
        fails.append((d, "rows-only query produced no parquet"))
    else:
        n = sum(len(pd.read_parquet(f)) for f in files)
        skips.append(f"{d}(rows={n})")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def dtype_class(s):
    """Coarse value-representation class, as the driver's hash sees it."""
    k = s.dtype.kind
    if k in "iu": return "int"
    if k == "f":  return "float"
    if k == "b":  return "bool"
    if k == "M":  return "datetime"
    return "object"

def repr_check(name, sdf, odf):
    """Driver-strictness representation gate (the two r12 failure classes):
    1. float-vs-int dtype drift — DuckDB widens e.g. an uncast SUM to
       HUGEINT, pandas converts HUGEINT->float64, and the driver hashes
       871.0 against Spark's 871 even though canon() equates them;
    2. non-scalar (array/struct) columns — the driver's comparer lexsorts
       raw columns and crashes on ndarray cells, while canon() happily
       stringifies them.
    Returns an error string, or None if the shapes are driver-safe."""
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        ks, ko = dtype_class(sdf[c]), dtype_class(odf[c])
        if {ks, ko} == {"int", "float"}:
            return (f"dtype drift col {c}: spark={sdf[c].dtype} vs "
                    f"oracle={odf[c].dtype} (driver hashes these differently"
                    " — cast the oracle/query so both sides agree)")
    # Non-scalar sweep covers EVERY value of EVERY object column on BOTH
    # sides (not just the first non-null of shared columns): a column
    # whose early rows are scalar but later rows are arrays, or one
    # present on a single side only, still crashes the driver comparer.
    def nonscalar(v):
        return isinstance(v, (list, tuple, dict, set)) or \
            getattr(v, "ndim", 0) > 0
    for side, df in (("spark", sdf), ("oracle", odf)):
        for c in sorted(df.columns):
            if df[c].dtype == object:
                nn = df[c].dropna()
                if len(nn) and nn.map(nonscalar).any():
                    return (f"non-scalar col {c} ({side}): driver comparer "
                            "cannot lexsort array/struct cells — reshape to "
                            "scalar rows (posexplode) or hash to a string")
    return None

for name in names:
    spark_files = glob.glob(f"{out}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "no spark output"))
        continue
    try:
        sraw = pd.concat([pd.read_parquet(f) for f in spark_files])
        oraw = con.sql(oracle[name]).df()
        rerr = repr_check(name, sraw, oraw)
        if rerr:
            fails.append((name, rerr))
            continue
        sdf, odf = canon(sraw), canon(oraw)
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    if list(sdf.columns) != list(odf.columns):
        fails.append((name, f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows spark={len(sdf)} oracle={len(odf)}"))
        continue
    mismatch = None
    for c in sdf.columns:
        a, b = sdf[c].values, odf[c].values
        for i in range(len(a)):
            x, y = a[i], b[i]
            if x is None and y is None:
                continue
            try:
                if isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y):
                    continue
            except Exception:
                pass
            eq = (x == y)
            if hasattr(eq, "all"):
                eq = bool(eq.all())
            if not eq and not (pd.isna(x) and pd.isna(y)):
                mismatch = f"col {c} row {i}: spark={x!r} oracle={y!r}"
                break
        if mismatch:
            break
    if mismatch:
        fails.append((name, mismatch))
    else:
        passes.append(name)

print(f"PASS {len(passes)}/{len(names)}: {' '.join(passes)}")
if skips:
    print(f"ROWS-ONLY {len(skips)}: {' '.join(skips)}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
