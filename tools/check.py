#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. (caller) runs graft.Verify to produce <outDir>/<name>/ parquet + oracle_sql.json
  2. this script runs each oracle SQL in DuckDB against the same parquet tables
  3. compares: row count, column names, and value hash (columns sorted by name,
     rows sorted by all columns) — strictest plausible form of the driver compare.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, floats stay exact
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d)])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"weak {name}: rows-only check, rows={len(got)} " + ("OK" if len(got) > 0 else "EMPTY!"))
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols spark={list(g.columns)} oracle={list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        bad = None
        for c in g.columns:
            a, b = g[c].values, e[c].values
            if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(e[c]):
                ok = np.array_equal(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64), equal_nan=True)
            else:
                ok = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
            if not ok:
                mism = None
                try:
                    arr_a, arr_b = pd.Series(a).astype(str), pd.Series(b).astype(str)
                    idx = (arr_a != arr_b).idxmax()
                    mism = f"row {idx}: spark={a[idx]!r} oracle={b[idx]!r}"
                except Exception:
                    pass
                bad = f"col {c}: {mism}"
                break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names) - n_pass - n_fail} weak")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
