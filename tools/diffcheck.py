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

def type_label(t):
    """Canonical label for an Arrow type, at the granularity the driver's
    serialized-hash gate distinguishes. Integer WIDTH matters (DuckDB
    HUGEINT exports as decimal128 — the exact drift that shipped e01/s01
    broken twice); string/binary storage flavors do not."""
    import pyarrow as pa
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{type_label(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_integer(t):
        # Width-insensitive: the driver's hash gate accepts Spark int32 vs
        # DuckDB BIGINT (e05/q09/v01/v06/v08 all hash-pass with that drift);
        # only the escape out of the integer class (HUGEINT → decimal128)
        # breaks it, and that is caught by the decimal branch above.
        return "int"
    return str(t)  # float/double, bool, date32, ... compare exactly

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
            got_tbl = con.execute(
                "SELECT * FROM read_parquet(" + repr(files) + ")").arrow()
            exp_tbl = con.execute(oracle[name]).arrow()
            got, exp = got_tbl.to_pandas(), exp_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}"); n_fail += 1; continue
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        # Type fidelity: the driver hash-compares SERIALIZED values, so a
        # DuckDB HUGEINT vs Spark BIGINT column fails its gate even when
        # every value compares equal in pandas. Catch that drift here.
        gt = {f.name: type_label(f.type) for f in got_tbl.schema}
        et = {f.name: type_label(f.type) for f in exp_tbl.schema}
        tbad = [f"{c}: spark={gt[c]} oracle={et[c]}" for c in g.columns if gt[c] != et[c]]
        if tbad:
            print(f"FAIL {name}: dtype drift — " + "; ".join(tbad))
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
