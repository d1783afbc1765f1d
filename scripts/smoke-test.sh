#!/bin/bash
# Reference: scripts/smoke-test.sh — 3 scenes x 3 ways at small sizes,
# checks exit status only.
set -e
cd "$(dirname "$0")/.."
for scene in cornell single-sphere example1; do
  for way in dod oo fp; do
    python -m pt_three_ways_tpu.cli -w 32 -h 32 --spp 2 --seed 1 \
      --save-every 0 --way "$way" --scene "$scene" /tmp/smoke-$scene-$way.png
    echo "ok: $scene/$way"
  done
done
echo "smoke test passed"
