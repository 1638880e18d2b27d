#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only, not
part of the shipped library): run after `sbt "runMain graft.Verify
<sfDir> <outDir>"`, compares each query's parquet dump against its DuckDB
oracle on the same testdata.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison — keep integers integral (the driver's
    # hash distinguishes int64 from HUGEINT/float; coercing to float64 here
    # masked exactly that class of oracle bug, and loses exactness > 2^53)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith('datetime64'):
            df[c] = df[c].astype('datetime64[us]')
        elif str(df[c].dtype).startswith(('Int', 'UInt', 'int', 'uint')):
            df[c] = df[c].astype('Int64')
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def kind(dtype) -> str:
    s = str(dtype)
    if s.startswith(('Int', 'UInt', 'int', 'uint')): return 'int'
    if s.startswith('float'): return 'float'
    if s.startswith('datetime64'): return 'ts'
    if s == 'bool' or s == 'boolean': return 'bool'
    return 'str'

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"); fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fail += 1; continue
        kinds_g = [kind(t) for t in g.dtypes]
        kinds_w = [kind(t) for t in w.dtypes]
        if kinds_g != kinds_w:
            mism = [(c, a, b) for c, a, b in zip(g.columns, kinds_g, kinds_w) if a != b]
            print(f"FAIL {name}: type kinds differ {mism}"); fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"OK   {name}: rows={len(g)}"); ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n  {str(e)[:500]}"); fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
