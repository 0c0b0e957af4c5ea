#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [verify_out_dir] [sf_dir]

Reads each <out>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over views registered
on the sf parquet tables, sorts columns by name and rows by all columns,
and compares values exactly. Dev harness only — not part of the library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for stable compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "target/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleUp's sf1)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
    if len(sys.argv) > 3:  # optional comma-separated name filter
        keep = set(sys.argv[3].split(","))
        names = [n for n in names if n in keep]
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); n_noracle += 1; continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first:")
            idx = bad.idxmax()
            print("  got:", g.loc[idx].to_dict())
            print("  exp:", e.loc[idx].to_dict())
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
