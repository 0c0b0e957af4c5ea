#!/usr/bin/env python3
"""Bounded-replay DuckDB oracle compare: materialize each top-level CTE
as a TEMP TABLE, stage by stage, then run the final SELECT.

Usage: python3 tools/staged_check.py <verify_out_dir> <sf_dir> <names_csv>

The r8 bounded-replay recipe (pre-staged inputs, unrolled CTEs) applied
GENERICALLY: the committed oracle SQL for the heavy ledger rows is a
chain of single-reference-style CTEs that DuckDB inlines, so one
statement carries the whole computation — at sf10 the q_pagerank replay
re-derived the 120M-row edge frame per iteration and spilled >50 GB of
temp before dying. Splitting the WITH chain at its top-level boundaries
and materializing each stage is semantics-preserving (CTE bodies are
pure SQL over earlier stages; every ledger oracle is deterministic by
the repo's cross-engine contract), and bounds peak memory at ONE stage.

Compares exactly like tools/check.py (sorted columns, sorted rows,
exact values after dtype canonicalization). Dev harness only — not part
of the library.
"""
import os, re, sys, glob, json, time
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon, TABLES


def split_ctes(sql):
    """Split a WITH chain into ([(name, body)...], final_select).
    Returns ([], sql) when the statement has no top-level WITH."""
    s = sql.lstrip()
    if not re.match(r"(?is)^WITH\b", s):
        return [], sql
    i = re.match(r"(?is)^WITH\s+(RECURSIVE\s+)?", s).end()
    if s[:i].upper().find("RECURSIVE") >= 0:
        return [], sql  # recursive CTEs stay monolithic
    ctes = []
    while True:
        m = re.match(r'(?s)\s*([A-Za-z_][A-Za-z0-9_]*|"[^"]+")\s+AS\s+(MATERIALIZED\s+)?\(',
                     s[i:], re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse CTE header at: {s[i:i+80]!r}")
        name = m.group(1)
        j = i + m.end()  # position just past the opening paren
        depth, q = 1, None
        while depth > 0:
            if j >= len(s):  # truncated SQL: loud failure, not IndexError
                raise ValueError(f"unbalanced parens scanning CTE {name!r}")
            c = s[j]
            if q:
                if c == q:
                    q = None
            elif s[j:j + 2] == "--":  # line comment: parens inside don't count
                nl = s.find("\n", j)
                j = len(s) if nl < 0 else nl
            elif s[j:j + 2] == "/*":  # block comment likewise
                end = s.find("*/", j + 2)
                if end < 0:
                    raise ValueError(f"unterminated /* comment in CTE {name!r}")
                j = end + 1
            elif c in ("'", '"'):
                q = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        ctes.append((name, s[i + m.end():j - 1]))
        k = re.match(r"\s*,", s[j:])
        if k:
            i = j + k.end()
        else:
            return ctes, s[j:]


def main():
    out = sys.argv[1]
    sf = sys.argv[2]
    names = sys.argv[3].split(",")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_fail = 0
    for name in names:
        t0 = time.time()
        con = duckdb.connect()  # fresh db per query: temp tables drop
        con.execute("SET TimeZone='UTC'")
        con.execute("SET max_temp_directory_size='60GiB'")
        if os.environ.get("GRAFT_DUCK_THREADS"):
            con.execute(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet", flush=True); n_fail += 1; continue
        try:
            ctes, final = split_ctes(oracle[name])
            for cname, body in ctes:
                con.execute(f"CREATE TEMP TABLE {cname} AS {body}")
                if os.environ.get("GRAFT_STAGE_VERBOSE"):
                    n = con.execute(f"SELECT count(*) FROM {cname}").fetchone()[0]
                    print(f"  [{name}] {cname}: {n} rows "
                          f"t={int(time.time()-t0)}s", flush=True)
            exp = con.execute(final).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]} "
                  f"oracle_wall={int(time.time()-t0)}s", flush=True)
            n_fail += 1
            con.close(); continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        g, e = canon(got), canon(exp)
        ok = (list(g.columns) == list(e.columns) and len(g) == len(e) and g.equals(e))
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(g)} rows) "
              f"oracle_wall={int(time.time()-t0)}s", flush=True)
        if not ok:
            n_fail += 1
            print(f"  cols {list(g.columns)} vs {list(e.columns)}; rows {len(g)} vs {len(e)}")
        con.close()
    print("ALL-PASS" if n_fail == 0 else f"{n_fail} FAIL", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
