#!/usr/bin/env bash
# Round-end gate: compile -> test -> Verify -> Bench. Refuse the snapshot
# commit on any red. Born from the round-10 postmortem: the final commit
# landed an uncompiled source edit (GraphOps.scala:706 vs the new RegMax
# signature) and zeroed the round's correctness/bench artifacts. Run this
# BEFORE every end-of-round commit; it exits non-zero on the first red.
set -euo pipefail
cd "$(dirname "$0")/.."

# bench defaults to sf0.1 — the SF the driver benches and the committed
# BENCH_r*.json records use, so the regression tripwire below compares
# like with like
SF_VERIFY="${SPARK_GRAFT_VERIFY_SF:-/root/testdata/sf0.001}"
SF_BENCH="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
# fall back when the sf0.1 fixture is absent (round-12 advice: machines
# without it failed the gate at the bench step); benchcmp skips the
# regression compare on an SF mismatch, so the fallback stays safe
if [ ! -d "$SF_BENCH" ]; then
  echo "WARN: bench fixture $SF_BENCH absent — falling back to sf0.01"
  SF_BENCH=/root/testdata/sf0.01
fi
OUT="${GATE_OUT:-/tmp/graft_gate}"
mkdir -p "$OUT"

echo "== gate: sbt compile+test =="
sbt -batch "set Test/testOptions += Tests.Argument(\"-oI\")" test \
  > "$OUT/test.log" 2>&1 || { tail -40 "$OUT/test.log"; echo "GATE RED: tests"; exit 1; }
tail -4 "$OUT/test.log"

echo "== gate: Verify (sf=$SF_VERIFY) =="
rm -rf "$OUT/verify"
sbt -batch "runMain graft.Verify $SF_VERIFY $OUT/verify" \
  > "$OUT/verify.log" 2>&1 || { tail -40 "$OUT/verify.log"; echo "GATE RED: verify"; exit 1; }
n_results=$(find "$OUT/verify" -mindepth 1 -maxdepth 1 -type d | wc -l)
n_fail=$(grep -c '\[verify\].*failed' "$OUT/verify.log" || true)
echo "verify wrote $n_results result dirs, $n_fail failures"
[ "$n_results" -gt 0 ] || { echo "GATE RED: verify wrote nothing"; exit 1; }
[ "$n_fail" = "0" ] || { grep '\[verify\].*failed' "$OUT/verify.log"; echo "GATE RED: verify failures"; exit 1; }

echo "== gate: DuckDB differential (sf=$SF_VERIFY) =="
# dirs-only counting misses value drift — run the full oracle compare at
# the verify SF (cheap: DuckDB over the small fixture; the driver runs
# the same compare at sf0.01, so this is the cross-SF early warning)
python3 tools/diffcheck.py "$SF_VERIFY" "$OUT/verify" > "$OUT/diffcheck.log" 2>&1 \
  || { grep -E "FAIL|Traceback" "$OUT/diffcheck.log" | head -20; echo "GATE RED: oracle diff"; exit 1; }
tail -2 "$OUT/diffcheck.log"

echo "== gate: Bench (sf=$SF_BENCH) =="
# GRAFT_DETAIL_OUT: the gate's full-run detail goes to the scratch dir —
# the COMMITTED bench_detail.json is the per-family-isolated record
# (tools/bench_detail.sh) and a full-run overwrite would silently
# re-poison it with cross-family cache pressure
SPARK_GRAFT_SF_DIR="$SF_BENCH" GRAFT_DETAIL_OUT="$OUT/bench_detail_fullrun.json" \
  sbt -batch "runMain graft.Bench" \
  > "$OUT/bench.log" 2>&1 || { tail -40 "$OUT/bench.log"; echo "GATE RED: bench"; exit 1; }
grep '"metric":"total"' "$OUT/bench.log" | tail -1
n_failed=$(grep '"metric":"total"' "$OUT/bench.log" | tail -1 | sed 's/.*"n_failed":\([0-9]*\).*/\1/')
[ "${n_failed:-1}" = "0" ] || { echo "GATE RED: bench n_failed=$n_failed"; exit 1; }

echo "== gate: bench-regression tripwire (vs last committed BENCH_r*.json) =="
# on red, re-run the offending families ONCE before flipping the gate:
# this host shows up to 3x contention swings on identical plans
# (round-12 advice) — a regression must survive a second, quieter sample
if ! python3 tools/benchcmp.py "$OUT/bench.log" | tee "$OUT/benchcmp.log"; then
  fams=$(sed -n 's/^RERUN_FAMILIES=//p' "$OUT/benchcmp.log" | tail -1)
  [ -n "$fams" ] || { echo "GATE RED: bench regression"; exit 1; }
  echo "== gate: benchcmp red — re-running families [$fams] once (contention check) =="
  SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_FAMILIES="$fams" \
    GRAFT_DETAIL_OUT="$OUT/bench_detail_retry.json" \
    sbt -batch "runMain graft.Bench" > "$OUT/bench_retry.log" 2>&1 || true
  python3 tools/benchcmp.py "$OUT/bench.log" --retry "$OUT/bench_retry.log" \
    || { echo "GATE RED: bench regression (confirmed after family re-run)"; exit 1; }
fi

echo "GATE GREEN"
