#!/usr/bin/env python3
"""Bench-regression tripwire (round-11 brief #7): compare a fresh gate
bench run against the last committed BENCH_r*.json at the same SF and go
red above a 1.5x family-level jump — the driver's 2x budget gets the
same automation that protects compile/test.

Usage: python3 tools/benchcmp.py <gate_bench_log> [repo_root]

Sources:
- gate log: sbt stdout of `runMain graft.Bench` — family records
  {"f":"q","ds":[...]} (integer deciseconds; null = id gap, -1 = failed)
  and the {"metric":"total",...} headline.
- reference: the highest-numbered BENCH_r*.json in the repo whose run
  succeeded (rc=0); its "tail" field holds the same stdout lines.

Exit 0 (with a note) when there is no comparable reference — different
SF, no rc=0 record, or no family lines survived the tail clip. Exit 1
when total or any family with a reference subtotal >= 2.0 s regresses
beyond 1.5x. Families smaller than 2.0 s are noise at decisecond
resolution and only count toward the total.
"""
import glob
import json
import os
import re
import sys

THRESH = 1.5
FAMILY_FLOOR_S = 2.0


def parse_lines(text):
    """(total, sf, {family: ds list}) from bench stdout text."""
    total, sf, fams = None, None, {}
    for m in re.finditer(r'\{"metric":"total".*?\}', text):
        rec = json.loads(m.group(0))
        total, sf = rec["value"], rec.get("sf")
    for m in re.finditer(r'\{"f":"(\w)","ds":\[[^\]]*\]\}', text):
        rec = json.loads(m.group(0))
        fams[rec["f"]] = rec["ds"]
    return total, sf, fams


def common_subtotals(ref_ds, cur_ds):
    """Per-family subtotal seconds over POSITIONS valid in BOTH records —
    a query added or retired between rounds must not masquerade as (or
    mask) a regression in the queries both rounds actually ran."""
    n = min(len(ref_ds), len(cur_ds))
    pairs = [(r, c) for r, c in zip(ref_ds[:n], cur_ds[:n])
             if r is not None and c is not None and r >= 0 and c >= 0]
    return (sum(r for r, _ in pairs) / 10.0, sum(c for _, c in pairs) / 10.0)


def main():
    log_path = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cur_total, cur_sf, cur_fams = parse_lines(open(log_path).read())
    if cur_total is None:
        print("benchcmp RED: gate bench log has no total line")
        return 1

    refs = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)), reverse=True)
    ref = None
    for p in refs:
        rec = json.load(open(p))
        if rec.get("rc") == 0 and rec.get("tail"):
            ref = (p, rec)
            break
    if ref is None:
        print("benchcmp: no rc=0 BENCH_r*.json reference — skipping (first green round)")
        return 0
    ref_path, rec = ref
    ref_total, ref_sf, ref_fams = parse_lines(rec["tail"])
    if ref_total is None:
        print(f"benchcmp: {ref_path} tail clipped past every total line — skipping")
        return 0
    if ref_sf != cur_sf:
        print(f"benchcmp: SF mismatch (gate {cur_sf} vs {ref_path} {ref_sf}) — skipping")
        return 0

    red = []
    if cur_total > THRESH * ref_total:
        red.append(f"total {cur_total:.1f}s > {THRESH}x ref {ref_total:.1f}s "
                   "(note: totals span each round's own query set)")
    common = {f: common_subtotals(ref_fams[f], cur_fams[f])
              for f in sorted(set(ref_fams) & set(cur_fams))}
    for f, (rv, cv) in common.items():
        if rv >= FAMILY_FLOOR_S and cv > THRESH * rv:
            red.append(f"family {f} {cv:.1f}s > {THRESH}x ref {rv:.1f}s (common queries only)")
    print(f"benchcmp vs {os.path.basename(ref_path)} (sf {cur_sf}): "
          f"total {ref_total:.1f}s -> {cur_total:.1f}s; common-query families "
          + ", ".join(f"{f}:{r:.1f}->{c:.1f}" for f, (r, c) in common.items()))
    if red:
        print("benchcmp RED: " + "; ".join(red))
        return 1
    print("benchcmp OK (threshold {}x)".format(THRESH))
    return 0


if __name__ == "__main__":
    sys.exit(main())
