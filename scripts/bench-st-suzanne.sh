#!/bin/bash
# Reference: scripts/bench-st-suzanne.sh — suzanne 256x256 @8spp.
set -e
cd "$(dirname "$0")/.."
python -m pt_three_ways_tpu.cli -w 256 -h 256 --spp 8 --seed 1 \
  --save-every 0 --scene suzanne /tmp/bench-suzanne.png
