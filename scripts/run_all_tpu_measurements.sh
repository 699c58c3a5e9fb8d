#!/bin/bash
# Run every queued TPU measurement sequentially on a QUIET host
# (CLAUDE.md: never overlap CPU work with relay-backed TPU timing).
# Each prints its JSON row; logs land in /tmp/r5_*.log and are copied to
# artifacts/r5/ at the end.
#
# Order: cheapest-first so early relay flakiness costs least; bench.py
# LAST (it is the driver's headline capture and wants warm caches gone —
# it measures its own compile/warm-up split).
set -u
cd "$(dirname "$0")/.."

# fail fast on a dead relay (BENCH_r03 hung 40 min before dying)
probe() {
  for p in 8082 8083 8117; do
    if timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/$p" 2>/dev/null; then
      return 0
    fi
  done
  return 1
}
if ! probe; then
  echo '{"error": "relay_unreachable", "battery": "aborted"}'
  exit 1
fi

MAIN_LOG=/tmp/r5_measure.log
run() {
  local name=$1; shift
  local tmo=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$MAIN_LOG"
  if ! probe; then
    echo "--- $name SKIPPED: relay died mid-battery" | tee -a "$MAIN_LOG"
    return
  fi
  timeout "$tmo" env "$@" python "scripts/$name" > "/tmp/r5_${name%.py}.log" 2>&1
  local rc=$?
  tail -5 "/tmp/r5_${name%.py}.log" | tee -a "$MAIN_LOG"
  echo "--- $name rc=$rc" | tee -a "$MAIN_LOG"
}

# Battery state after the r5 hardware sessions (2026-08-18/19): rows with
# numbers in BASELINE.md are DONE (validate incl. masked row, warmup
# probe, config2 bake-off, config3, config4, config5 slab, ADMM, CV
# headline).  Still queued: headline working-set re-run (OOM fix landed,
# never re-measured) and the gather-stall probe (the open 5-30 s polish
# item).  Cheapest-first as always.
run validate_batch_kernels_tpu.py 1200
run probe_gather_stall.py   2400
run measure_headline_ws.py  3600
run measure_cv_headline.py  4800
run probe_warmup_aot.py     2400
run measure_config2.py      2400
run measure_config4.py      3000
run measure_config3.py      2400
run measure_config5_slab.py 3000
run measure_admm_scale.py   3600

echo "=== bench.py ($(date -u +%H:%M:%S)) ===" | tee -a "$MAIN_LOG"
if probe; then
  timeout 3000 python bench.py > /tmp/r5_bench.log 2>&1
  echo "--- bench rc=$?" | tee -a "$MAIN_LOG"
  tail -3 /tmp/r5_bench.log | tee -a "$MAIN_LOG"
fi

mkdir -p artifacts/r5
cp /tmp/r5_*.log artifacts/r5/ 2>/dev/null
echo "ALL DONE $(date -u)" | tee -a "$MAIN_LOG"
