#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir> [name ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran. For each
query, loads the engine's parquet output and the DuckDB oracle result, sorts
columns by name, rounds doubles to 9 significant digits, sorts rows, compares.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            out[c] = s.astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            def r9(x):
                if pd.isna(x):
                    return "NaN"
                if x == 0:
                    return "0"
                return f"{x:.9e}"
            out[c] = s.map(r9)
        elif np.issubdtype(s.dtype, np.bool_) or str(s.dtype) == "boolean":
            out[c] = s.astype(str)
        elif np.issubdtype(s.dtype, np.integer):
            out[c] = s.astype("int64").astype(str)
        else:
            out[c] = s.astype(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns)).reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no engine output at {pq_dir}")
            n_fail += 1
            continue
        try:
            mine = canon(pd.concat([pd.read_parquet(f) for f in files]))
            ref = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs oracle {list(ref.columns)}")
            n_fail += 1
        elif len(mine) != len(ref):
            print(f"FAIL {name}: {len(mine)} rows vs oracle {len(ref)}")
            n_fail += 1
        elif not mine.equals(ref):
            neq = (mine != ref).any(axis=1)
            idx = mine.index[neq][:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(mine)} rows differ; first diffs:")
            for i in idx:
                print(f"  mine  : {mine.loc[i].to_dict()}")
                print(f"  oracle: {ref.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
