#!/usr/bin/env python3
"""Local differential check: Spark results (Verify output) vs DuckDB oracle.

Mimics the driver's t2 gate: for each query, run the oracle SQL in DuckDB
over views of the same parquet fixtures, sort columns by name, and compare
values exactly (floats byte-exact — the engine is designed so derived
floats are bit-identical across engines).

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                "SELECT * FROM read_parquet(" + repr(files) + ")").df()
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}"); n_fail += 1; continue
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    eq = (a.astype('float64').values == b.astype('float64').values) | (a.isna().values & b.isna().values)
                else:
                    eq = (a.astype(object).values == b.astype(object).values) | (a.isna().values & b.isna().values)
            except Exception as ex:
                bad.append((c, f"cmp error {ex}")); continue
            if not eq.all():
                i = int((~eq).argmax())
                bad.append((c, f"row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} ({int((~eq).sum())} diffs)"))
        if bad:
            print(f"FAIL {name}: " + "; ".join(f"{c} {m}" for c, m in bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
