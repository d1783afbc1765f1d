"""Scaling evidence for the >=85% multi-chip target.

Real multi-chip hardware is not available in this environment (one tunneled
chip), so two proxies:

1. ANALYTIC MODEL (the sharding design's communication budget): per sample
   pass the ONLY collective is the framebuffer psum over dp — paths are
   independent, so nothing else communicates (SURVEY section 2 table). The
   model compares measured single-chip compute time per pass against the
   psum's wire time on ICI/DCN and prints predicted scaling efficiency.

2. VIRTUAL-MESH SANITY CURVE: sharded-render dispatch overhead measured on
   1/2/4/8 virtual CPU devices (no real parallel speedup expected on one
   host — this checks that shard_map/psum plumbing adds no superlinear
   overhead as sp grows).

Usage:
  python tools/scaling_model.py             # analytic model from ms/pass
  python tools/scaling_model.py --curve     # CPU virtual-mesh curve too
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip-interconnect budgets (public figures, How to Scale Your Model)
ICI_GBPS = 1600 / 8  # v5e: 1600 Gbit/s bidirectional per link -> ~200 GB/s
DCN_GBPS = 25  # per-host DCN, conservative
MS = 1e3


# MEASURED single-chip anchors (round 5, live v5e): ms/pass at the bench
# configs, plus the measured DISPATCH-MACHINERY cost of the sharded path —
# render_sharded on a (1,1) mesh measured FASTER than plain render()
# (tools/bench_sharded.py: 5.10 s vs 6.44 s for suzanne 256²@64spp; both
# dominated by per-call retracing), so the sharding overhead term the
# round-3 analytic model guessed at is measured ~0 and the psum remains
# the only per-pass cost that scales with chip count.
MEASURED_MS_PER_PASS = (17.2, 26.2, 4.0)  # cornell, suzanne, ce (round 5)


def analytic(width=256, height=256, ms_per_pass=MEASURED_MS_PER_PASS):
    names = ("cornell", "suzanne", "ce")
    fb_bytes = width * height * 3 * 4
    print(f"framebuffer psum payload: {fb_bytes/1e6:.1f} MB per pass "
          f"({width}x{height}x3 f32)")
    print("sharded dispatch machinery overhead: measured ~0 on the real "
          "chip ((1,1)-mesh render_sharded <= plain render; "
          "tools/bench_sharded.py round 4)")
    for name, ms in zip(names, ms_per_pass):
        # ring all-reduce moves 2*(n-1)/n * bytes per chip; bound by 2x
        t_ici = 2 * fb_bytes / (ICI_GBPS * 1e9) * MS
        t_dcn = 2 * fb_bytes / (DCN_GBPS * 1e9) * MS
        eff_ici = ms / (ms + t_ici)
        eff_dcn = ms / (ms + t_dcn)
        print(f"  {name:8s} {ms:6.1f} ms/pass: psum {t_ici:.3f} ms (ICI) "
              f"-> {eff_ici*100:.1f}% eff; {t_dcn:.2f} ms (DCN) "
              f"-> {eff_dcn*100:.1f}% eff")
    print("(dp replicas also fold RNG locally; no other collective exists "
          "in the pass, so efficiency is bounded by the psum alone)")


def curve():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pt_three_ways_tpu.parallel.mesh import make_mesh
    from pt_three_ways_tpu.parallel.shard import render_sharded
    from tests.test_sharding import build

    scene, camera, params = build(width=64, height=64)
    params = params.replace(samples_per_pixel=4)
    print("virtual 8-CPU mesh (one host — measures shard_map overhead, not "
          "real scaling):")
    base = None
    for sp in (1, 2, 4, 8):
        mesh = make_mesh(n_devices=sp, dp=1)
        render_sharded(scene, camera, params, mesh)  # warm
        t0 = time.perf_counter()
        render_sharded(scene, camera, params, mesh)
        dt = time.perf_counter() - t0
        base = base or dt
        print(f"  sp={sp}: {dt*MS:7.1f} ms  (x{base/dt:.2f} vs sp=1)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", action="store_true")
    args = ap.parse_args(argv)
    analytic()
    if args.curve:
        curve()
    return 0


if __name__ == "__main__":
    sys.exit(main())
