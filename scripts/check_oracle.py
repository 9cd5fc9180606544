#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: for each query in
oracle_sql.json, run the SQL in DuckDB over the same parquet tables and
compare against the Spark parquet dump (column-name-sorted, row-order
independent)."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify-out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"{q:28s} MISSING spark output"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{q:28s} ERROR {e}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"{q:28s} SCHEMA got={gc} want={wc}"); fails += 1; continue
    # the driver hashes MATERIALIZED values, so an int column on one side vs
    # float on the other (e.g. DuckDB HUGEINT -> float64) hash-mismatches
    # even when numerically identical — treat dtype-kind divergence as FAIL
    kind_bad = [c for c in gc
                if {got[c].dtype.kind, want[c].dtype.kind} == {"i", "f"}]
    if kind_bad:
        print(f"{q:28s} DTYPE int-vs-float cols={kind_bad} "
              f"got={[str(got[c].dtype) for c in kind_bad]} "
              f"want={[str(want[c].dtype) for c in kind_bad]}")
        fails += 1; continue
    g = got[gc].sort_values(by=gc).reset_index(drop=True)
    w = want[wc].sort_values(by=wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"{q:28s} ROWS got={len(g)} want={len(w)}"); fails += 1; continue
    # normalize dtypes for compare
    import pandas as pd
    try:
        eq = True
        for c in gc:
            a, b = g[c], w[c]
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), atol=1e-9, equal_nan=True):
                    eq = False
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    eq = False
            if not eq:
                bad = [(x, y) for x, y in zip(a.values[:2000], b.values[:2000]) if str(x) != str(y)][:5]
                print(f"{q:28s} VALUES col={c} diff sample={bad}")
                break
        if eq:
            print(f"{q:28s} OK rows={len(g)}")
        else:
            fails += 1
    except Exception as e:
        print(f"{q:28s} CMP ERROR {e}"); fails += 1

# rows-only queries
for d in sorted(glob.glob(f"{out_dir}/*/")):
    q = os.path.basename(d.rstrip('/'))
    if q not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"{q:28s} rows-only rows={n}")
        except Exception as e:
            print(f"{q:28s} rows-only ERROR {e}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
