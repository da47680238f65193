#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — ARROW-LEVEL, TYPE-FAITHFUL.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. (caller) runs graft.Verify to produce <outDir>/<name>/ parquet + oracle_sql.json
  2. this script runs each oracle SQL in DuckDB against the same parquet tables
  3. compares, like the driver does:
       - row count
       - arrow SCHEMA (column names sorted, exact arrow types — a Spark int64
         vs a DuckDB decimal128(38,0) HUGEINT sum is a FAIL even when every
         value is numerically equal; round 1 shipped 7 such misses because the
         old pandas-level compare silently coerced them)
       - arrow VALUES (rows sorted by all columns, exact representation)

Exit code 1 on any FAIL.
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def canon(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names)).combine_chunks()
    try:
        t = t.sort_by([(c, "ascending") for c in t.column_names])
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
        pass  # unsortable column types (lists); compare unsorted
    return t


def type_diff(a: pa.Schema, b: pa.Schema):
    """Column-name/type differences, ignoring nullability (the driver hashes
    values+types; nullability flags differ benignly between writers)."""
    an = {f.name: f.type for f in a}
    bn = {f.name: f.type for f in b}
    if sorted(an) != sorted(bn):
        return f"cols spark={sorted(an)} oracle={sorted(bn)}"
    bad = [f"{n}: spark={an[n]} oracle={bn[n]}" for n in sorted(an) if an[n] != bn[n]]
    return "; ".join(bad) if bad else None


def values_diff(g: pa.Table, e: pa.Table):
    for c in g.column_names:
        ga, ea = g[c].to_pylist(), e[c].to_pylist()
        for i, (x, y) in enumerate(zip(ga, ea)):
            same = (x == y) or (x is None and y is None) or (
                isinstance(x, float) and isinstance(y, float) and x != x and y != y)
            if not same:
                return f"col {c} row {i}: spark={x!r} oracle={y!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d)])
    n_pass = n_fail = n_weak = 0
    # a query Verify attempted but that wrote no output is a hard FAILURE
    # (round 6: 28 analysis crashes read as "not checked" and the round
    # shipped red) — never let absence look like a pass
    decl_path = os.path.join(out_dir, "declared.json")
    if os.path.exists(decl_path):
        for name in sorted(set(json.load(open(decl_path))) - set(names)):
            print(f"FAIL {name}: declared but produced NO output (crashed?)")
            n_fail += 1
    for name in names:
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pa.concat_tables([pq.read_table(f) for f in files])
        if name not in oracle:
            n_weak += 1
            print(f"weak {name}: rows-only check, rows={got.num_rows} " + ("OK" if got.num_rows > 0 else "EMPTY!"))
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {str(ex)[:200]}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if g.num_rows != e.num_rows:
            print(f"FAIL {name}: rows spark={g.num_rows} oracle={e.num_rows}"); n_fail += 1; continue
        td = type_diff(g.schema, e.schema)
        if td:
            print(f"FAIL {name}: TYPE {td}"); n_fail += 1; continue
        vd = values_diff(g, e)
        if vd:
            print(f"FAIL {name}: {vd}"); n_fail += 1; continue
        print(f"PASS {name} ({g.num_rows} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
