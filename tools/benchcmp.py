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
    """(total, sf, {family: subtotal_seconds}) from bench stdout text."""
    total, sf, fams = None, None, {}
    for m in re.finditer(r'\{"metric":"total".*?\}', text):
        rec = json.loads(m.group(0))
        total, sf = rec["value"], rec.get("sf")
    for m in re.finditer(r'\{"f":"(\w)","ds":\[[^\]]*\]\}', text):
        rec = json.loads(m.group(0))
        fams[rec["f"]] = sum(d for d in rec["ds"] if d is not None and d > 0) / 10.0
    return total, sf, fams


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
        red.append(f"total {cur_total:.1f}s > {THRESH}x ref {ref_total:.1f}s")
    for f, rv in sorted(ref_fams.items()):
        cv = cur_fams.get(f)
        if cv is not None and rv >= FAMILY_FLOOR_S and cv > THRESH * rv:
            red.append(f"family {f} {cv:.1f}s > {THRESH}x ref {rv:.1f}s")
    grew = {f: (ref_fams.get(f), cur_fams.get(f)) for f in sorted(set(ref_fams) | set(cur_fams))}
    print(f"benchcmp vs {os.path.basename(ref_path)} (sf {cur_sf}): "
          f"total {ref_total:.1f}s -> {cur_total:.1f}s; families "
          + ", ".join(f"{f}:{(r if r is not None else 0):.1f}->{(c if c is not None else 0):.1f}"
                      for f, (r, c) in grew.items()))
    if red:
        print("benchcmp RED: " + "; ".join(red))
        return 1
    print("benchcmp OK (threshold {}x)".format(THRESH))
    return 0


if __name__ == "__main__":
    sys.exit(main())
