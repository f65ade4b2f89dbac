#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry (bare table names -> views over
the sf parquet dir) and compares against the parquet written by graft.Verify:
column names (sorted), row count, and value equality after sorting columns
by name and rows by all columns. Driver-side only; not part of the library.

Usage: python tools/verify_local.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps: coerce to ns-naive for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def values_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (np.ndarray, list)) or isinstance(b, (np.ndarray, list)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    have = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")}
    for name in sorted(have):
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"  ~ {name}: rows-only check, rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"  ✗ {name}: columns differ spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"  ✗ {name}: rowcount spark={len(g)} oracle={len(e)}")
            n_fail += 1; continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not values_equal(x, y):
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"  ✗ {name}: value mismatch col={c} row={i} spark={x!r} ({type(x).__name__}) oracle={y!r} ({type(y).__name__})")
            n_fail += 1
        else:
            # dtype check (advisory)
            dt_note = ""
            for c in g.columns:
                if str(g[c].dtype) != str(e[c].dtype):
                    dt_note += f" [dtype {c}: {g[c].dtype} vs {e[c].dtype}]"
            print(f"  ✓ {name}: rows={len(g)}{dt_note}")
            n_pass += 1
    print(f"PASS={n_pass} FAIL={n_fail} TOTAL_ORACLED={n_pass+n_fail}")
    return 0 if n_fail == 0 else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
