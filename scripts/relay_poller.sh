#!/bin/bash
# Relay poller (VERDICT r4 Weak #2): loop until the axon relay answers,
# then fire the full measurement battery exactly once.
#
# The battery itself (run_all_tpu_measurements.sh) re-probes before every
# script, so a relay that flaps mid-battery degrades gracefully.  This
# script adds the two things the battery cannot do for itself:
#   1. WAIT for the relay to come back (probe every 60 s, forever or until
#      --max-hours), so a live session is not required to catch the window;
#   2. WAIT for a QUIET host before launching (CLAUDE.md: a concurrent
#      pytest run inflates relay-backed TPU timings 10-70x) — it polls
#      until no pytest/bench process is visible, up to 30 min, then runs
#      anyway (a measurement with a caveat beats no measurement).
#
# Run it detached:  nohup scripts/relay_poller.sh >/tmp/relay_poller.log 2>&1 &
# State: touches /tmp/relay_battery_fired so a respawned poller does not
# re-run a battery that already fired this boot (delete the file to re-arm).
set -u
cd "$(dirname "$0")/.."

MAX_HOURS="${1:-24}"
FIRED_MARKER=/tmp/relay_battery_fired
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))

probe() {
  for p in 8082 8083 8117; do
    if timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/$p" 2>/dev/null; then
      return 0
    fi
  done
  return 1
}

# read-only process check (never kill anything): pytest or bench running?
host_busy() {
  pgrep -f "pytest|bench\.py" >/dev/null 2>&1
}

if [ -e "$FIRED_MARKER" ]; then
  echo "poller: $FIRED_MARKER exists — battery already fired; exiting"
  exit 0
fi

echo "poller: armed $(date -u); probing every 60 s for up to ${MAX_HOURS} h"
while ! probe; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "poller: deadline reached $(date -u); relay never came back"
    exit 1
  fi
  sleep 60
done
echo "poller: RELAY IS UP $(date -u)"

# quiet-host wait: up to 30 min, then proceed with a note
QUIET_DEADLINE=$(( $(date +%s) + 1800 ))
while host_busy; do
  if [ "$(date +%s)" -ge "$QUIET_DEADLINE" ]; then
    echo "poller: host still busy after 30 min — running anyway (timings suspect)"
    break
  fi
  echo "poller: host busy (pytest/bench visible); waiting 30 s"
  sleep 30
done

touch "$FIRED_MARKER"
echo "poller: launching battery $(date -u)"
bash scripts/run_all_tpu_measurements.sh
rc=$?
echo "poller: battery done rc=$rc $(date -u)"
exit $rc
