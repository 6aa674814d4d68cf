#!/usr/bin/env bash
# Re-record bench_detail.json under PER-FAMILY JVM ISOLATION (round-11
# brief #4): in the full-run record, early families' warm numbers read
# 2-3x high (g02 0.71->2.48 s, g11, e25-e27) because later families'
# persisted caches evict their storage-pool blocks — isolated JVMs
# measure each family's plans without that cross-family pressure, and
# the record carries its recording mode so readers need no commit
# archaeology. The driver's BENCH_r*.json stays the full-run record.
#
# Runs the families SEQUENTIALLY (two sbt servers collide on the
# socket); ~10 min at sf0.1.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${BENCH_DETAIL_OUT:-/tmp/graft_bench_fams}"
mkdir -p "$OUT"

FAMS="e g k m p q s t v"
# leftovers from a previous recording (a retired family, renamed
# queries) must not merge stale numbers into a record stamped with the
# CURRENT src_hash — the merge globs detail_*.json below
rm -f "$OUT"/detail_*.json
for f in $FAMS; do
  echo "== bench family $f (sf=$SF) =="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_FAMILIES="$f" \
    GRAFT_DETAIL_OUT="$OUT/detail_$f.json" \
    sbt -batch "runMain graft.Bench" > "$OUT/bench_$f.log" 2>&1 \
    || { tail -20 "$OUT/bench_$f.log"; echo "family $f FAILED"; exit 1; }
  grep -o '{"metric":"total".*' "$OUT/bench_$f.log" | tail -1
done

# src_hash binds the record to the source tree it measured (round-13
# verdict #1: a stale committed record left the round's perf claims
# unprovable) — tools/gate.sh recomputes and refuses a mismatched snapshot
SRC_HASH=$(bash tools/srchash.sh)   # we cd'd to the repo root above

python3 - "$OUT" "$SF" "$SRC_HASH" <<'EOF'
import glob, json, sys
out, sf, src_hash = sys.argv[1], sys.argv[2], sys.argv[3]
queries = {}
for p in sorted(glob.glob(out + "/detail_*.json")):
    queries.update(json.load(open(p))["queries"])
rec = {"metric": "detail", "unit": "sec",
       "mode": "isolated-family-jvm (tools/bench_detail.sh): one JVM per "
               "query family, so no cross-family cache pressure inflates "
               "warm numbers; the driver's BENCH_r*.json remains the "
               "full-run record",
       "src_hash": src_hash,
       "queries": dict(sorted(queries.items())), "sf": sf}
with open("bench_detail.json", "w") as f:
    f.write(json.dumps(rec, separators=(",", ":")) + "\n")
print(f"bench_detail.json: {len(queries)} queries merged (src_hash {src_hash})")
EOF
