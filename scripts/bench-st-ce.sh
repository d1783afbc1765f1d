#!/bin/bash
# Reference: scripts/bench-st-ce.sh — ce 64x64 @1spp.
set -e
cd "$(dirname "$0")/.."
python -m pt_three_ways_tpu.cli -w 64 -h 64 --spp 1 --seed 1 \
  --save-every 0 --scene ce /tmp/bench-ce.png
