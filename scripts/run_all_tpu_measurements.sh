#!/bin/bash
# Run every queued round-3 TPU measurement sequentially on a QUIET host
# (CLAUDE.md: never overlap CPU work with relay-backed TPU timing).
# Each prints its JSON row; logs land in /tmp/r3_*.log.
#
# Order: cheapest-first so early relay flakiness costs least.
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/r3_measure.log
  timeout "$1" python "scripts/$name" > "/tmp/r3_${name%.py}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r3_${name%.py}.log" | tee -a /tmp/r3_measure.log
  echo "--- $name rc=$rc" | tee -a /tmp/r3_measure.log
}

run measure_config2.py      2400
run measure_headline_ws.py  2400
run measure_config4.py      3000
run measure_config3.py      2400
run measure_config5_slab.py 3000
echo "ALL DONE $(date -u)" | tee -a /tmp/r3_measure.log
