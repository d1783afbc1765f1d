#!/bin/bash
# Reference: scripts/bench-st-cornell.sh — cornell 256x256 @32spp per way.
set -e
cd "$(dirname "$0")/.."
for way in dod oo fp; do
  echo "=== way=$way ==="
  python -m pt_three_ways_tpu.cli -w 256 -h 256 --spp 32 --seed 1 \
    --save-every 0 --way "$way" --scene cornell /tmp/bench-cornell-$way.png
done
