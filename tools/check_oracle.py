#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: load each query's
parquet result from a Verify output dir, run its DuckDB oracle SQL over the
fixture tables, and compare values (columns sorted by name, rows as-is).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    # normalize ints/floats across engines
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            n_bad += 1
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            n_bad += 1
            print(f"✗ {name}: column mismatch got={list(g.columns)} want={list(w.columns)}")
            continue
        if len(g) != len(w):
            n_bad += 1
            print(f"✗ {name}: row count {len(g)} vs {len(w)}")
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_rows = neq.any(axis=1)
            n_bad += 1
            print(f"✗ {name}: {bad_rows.sum()} differing rows; first diffs:")
            print(pd.concat([g[bad_rows].head(3).add_suffix("_got"),
                             w[bad_rows].head(3).add_suffix("_want")], axis=1))
            continue
        n_ok += 1
        print(f"✓ {name} ({len(g)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_noracle} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
