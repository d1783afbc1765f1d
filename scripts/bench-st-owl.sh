#!/bin/bash
# Reference: scripts/bench-st-owl.sh — bbc-owl 256x256 @128spp.
set -e
cd "$(dirname "$0")/.."
python -m pt_three_ways_tpu.cli -w 256 -h 256 --spp 128 --seed 1 \
  --save-every 0 --scene bbc-owl /tmp/bench-owl.png
