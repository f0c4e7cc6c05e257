#!/bin/bash
# Round-4 queue, part G (profiling; runs after part F releases the chip):
#   1. xplane profile of the multi-scene 4.0 s/it step — raster is ~0.3 s
#      and brute kNN ~0.35 s of it; this names the other ~3.3 s.
#   2. fresh xplane of the flagship bench step (VERDICT r3 #5: the
#      non-kernel ~26 ms after the matmul-scatter landing).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q
echo $$ > /tmp/r4g.pid  # part H serializes behind this (ADVICE r4)

# fail loudly if part F's pid file is missing instead of sailing through
if [ ! -f /tmp/r4f.pid ]; then
  echo "expected /tmp/r4f.pid (part F running) — refusing to start" >&2
  exit 1
fi
while kill -0 "$(cat /tmp/r4f.pid)" 2>/dev/null; do sleep 60; done

echo "=== G1. multi-scene step profile $(date) ==="
rm -rf /tmp/r4q/ms_profile
timeout 3600 python -m dss_tpu.apps.train_multiscene --scenes 4 \
  --points 25000 --views 8 --iters 15 \
  --profile-dir /tmp/r4q/ms_profile 2>&1 | tail -3
timeout 600 python scripts/xplane_top.py /tmp/r4q/ms_profile 40 \
  2>&1 | tee /tmp/r4q/ms_profile_top.txt | tail -5

echo "=== G2. flagship bench-step profile $(date) ==="
rm -rf /tmp/r4q/step_profile
timeout 1800 python scripts/profile_step.py --out /tmp/r4q/step_profile \
  2>&1 | tail -3
timeout 600 python scripts/xplane_top.py /tmp/r4q/step_profile 40 \
  2>&1 | tee /tmp/r4q/step_profile_top.txt | tail -5

echo "=== part G done $(date) ==="
