#!/bin/bash
# TPU relay watcher (CLAUDE.md wedge discipline): probe with a tiny cached
# matmul at most every 30 min; on the first success, run the round-4
# measurement queue ONCE and exit.  Probes are bounded by timeout so a
# wedged relay can't hang the watcher; rapid probing would enqueue more
# stuck clients and prolong a wedge, hence the long sleep.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_watch.log
echo "watcher start $(date)" >> "$LOG"
while true; do
  if timeout 600 python scripts/tpu_probe.py >> "$LOG" 2>&1; then
    echo "relay UP $(date) — running queue" >> "$LOG"
    bash scripts/tpu_queue_r4.sh >> /tmp/r4q/queue.log 2>&1
    echo "queue done $(date)" >> "$LOG"
    exit 0
  fi
  echo "relay still down $(date); sleeping 30 min" >> "$LOG"
  sleep 1800
done
