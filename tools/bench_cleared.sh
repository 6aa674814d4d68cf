#!/usr/bin/env bash
# Record bench_cleared.json — the cleared-memo graded lane (round-16
# brief #2, finishing round-15 advice #1): 58+ of the graded warms are
# memo/artifact readouts, so their BUILD paths were gated only by the
# per-family isolated cold column, and for cross-run-artifact and
# Derby-lifetime queries even the cold is a read (round-16 advice).
# This runs graft.Bench with GRAFT_CLEARED_PASS=1 —
# Memos.clearAllKeepingSharedDeployments (the CacheHygieneSpec-enforced
# hook list, minus the g09/g10/g21 shared armed-deployment triple,
# which is pass-scoped like the scratch artifact dir) before EVERY
# memo-served query — and GRAFT_ARTIFACT_DIR on a scratch dir so
# artifact-backed builds actually rebuild. Every number in the record
# is an uncached build, except g10/g21 which read the pass's shared
# deployment (built in g09, the first consumer in sorted order);
# tools/benchcmp.py --cleared compares against the record at HEAD and
# goes RED on the memo-build thresholds.
#
# One sample (builds are multi-second; the 2x RED ratio absorbs host
# noise). ~5-10 min at sf0.1. Like bench_detail.sh: run AFTER the last
# src/main edit — the record is src_hash-bound and tools/gate.sh
# refuses a mismatched snapshot. Never run concurrently with another
# sbt invocation.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${BENCH_CLEARED_OUT:-/tmp/graft_bench_cleared}"
mkdir -p "$OUT"
ART=$(mktemp -d /tmp/graft_cleared_art.XXXXXX)
trap 'rm -rf "$ART"' EXIT

echo "== cleared-memo bench pass (sf=$SF, scratch artifacts=$ART) =="
GRAFT_CLEARED_PASS=1 GRAFT_ARTIFACT_DIR="$ART" SPARK_GRAFT_SF_DIR="$SF" \
  GRAFT_DETAIL_OUT="$OUT/cleared.json" \
  sbt -batch "runMain graft.Bench" > "$OUT/bench_cleared.log" 2>&1 \
  || { tail -30 "$OUT/bench_cleared.log"; echo "cleared pass FAILED"; exit 1; }
grep -o '{"metric":"cleared_total".*' "$OUT/bench_cleared.log" | tail -1

SRC_HASH=$(bash tools/srchash.sh)
python3 - "$OUT/cleared.json" "$SRC_HASH" <<'EOF'
import json, sys
rec = json.load(open(sys.argv[1]))
rec["src_hash"] = sys.argv[2]
rec["mode"] = ("cleared-memo-fullrun (tools/bench_cleared.sh): "
               "Memos.clearAllKeepingSharedDeployments before each memo-served "
               "query and GRAFT_ARTIFACT_DIR on a scratch dir, so every number "
               "is an uncached BUILD - except g10/g21, which read the pass's "
               "shared armed deployment (round 19; built in g09). A shared "
               "artifact's or deployment's build cost lands in its first "
               "consumer in sorted order — deterministic, hence comparable "
               "round over round.")
with open("bench_cleared.json", "w") as f:
    f.write(json.dumps(rec, separators=(",", ":")) + "\n")
fails = [n for n, q in rec["queries"].items() if q.get("build") == "fail"]
print(f"bench_cleared.json: {len(rec['queries'])} builds (src_hash {rec['src_hash']})"
      + (f"; FAILED: {fails}" if fails else ""))
EOF
