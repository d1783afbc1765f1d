"""Headline benchmark: Cornell Box wavefront rays/second on one chip.

Prints the headline JSON line FIRST:
  {"metric": "cornell_mray_per_s", "value": N, "unit": "Mray/s",
   "vs_baseline": N / 50.0}
then one line per mesh scene (suzanne, ce) so round-over-round perf on real
meshes is tracked (same fields; vs_baseline relative to the same 50 Mray/s
target).

baseline = the 50 Mray/s/chip north-star target (BASELINE.md). The reference
itself publishes no numbers (its README disclaims performance), so the target
is the driver-specified goal, not a measured C++ figure.

Rays counted are LIVE rays: camera rays plus alive path lanes entering each
bounce (dead/masked/zero-throughput lanes are excluded even when the
wavefront still dispatches them — note the zero-beta kill makes emission-
dominated scenes like ce report few live rays while ms/pass collapses; the
samples_per_ms field tracks end-to-end speed).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compilation cache: repeated bench runs skip the (expensive,
# possibly remote) compile
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams

WIDTH = HEIGHT = 256
# Measured per-scene optima for passes-per-dispatch and the feedback
# work-sort (v5e); the same tables drive the CLI's auto choice
# (models/catalog.py).
from pt_three_ways_tpu.models.catalog import (  # noqa: E402
    FEEDBACK_SORT_HINT,
    PASSES_PER_DISPATCH_HINT as PASSES_PER_SCENE,
)
TARGET_MRAY_S = 50.0


def bench_scene(scene_name: str, n_calls: int = 6):
    passes_per_call = PASSES_PER_SCENE.get(scene_name, 8)
    params = RenderParams(
        width=WIDTH, height=HEIGHT, samples_per_pixel=passes_per_call, seed=1
    )
    builder = SceneBuilder()
    camera = create_scene(builder, scene_name, params)
    scene = builder.build()

    n_pix = WIDTH * HEIGHT
    px = jnp.asarray(np.arange(n_pix, dtype=np.int32) % WIDTH)
    py = jnp.asarray(np.arange(n_pix, dtype=np.int32) // WIDTH)
    base = rng.base_key(params.seed)

    # ONE compiled program per call: the regenerating megakernel traces all
    # passes_per_call samples in a single dispatch on TPU (dead lanes refill
    # with the next sample); elsewhere fall back to a fori over passes.
    from pt_three_ways_tpu.models.integrator import (
        resolve_intersector,
        trace_passes_fused,
    )

    use_regen = (
        resolve_intersector(params).startswith("pallas")
        and params.fused != "off"
    )
    # feedback work-sort: chain each dispatch's per-lane bounce counts
    # into the next dispatch's lane ordering (bit-exact permutation;
    # suzanne 57.2 -> 38.5 ms/pass on v5e)
    use_sort = use_regen and FEEDBACK_SORT_HINT.get(scene_name, False)
    n_lanes = n_pix * params.first_bounce_samples

    @jax.jit
    def fused(sample0, sort_key):
        if use_regen:
            rad, nr, cnt = trace_passes_fused(
                scene, camera, params, base, sample0, 0, px, py,
                passes_per_call, with_ray_count=True,
                sort_key=sort_key if use_sort else None,
                with_lane_counts=True,
            )
            # accumulate INSIDE the jit: a separate host-side add costs a
            # whole extra device dispatch per call over the relay
            return rad, nr, sort_key + cnt if use_sort else cnt

        def body(i, carry):
            acc, rays = carry
            key = jax.random.fold_in(
                jax.random.fold_in(base, sample0 + i), 0
            )
            rad, nr = trace_pass(
                scene, camera, params, key, px, py, with_ray_count=True
            )
            return acc + rad, rays + nr

        acc, rays = jax.lax.fori_loop(
            0,
            passes_per_call,
            body,
            (jnp.zeros((n_pix, 3), jnp.float32), jnp.int32(0)),
        )
        return acc, rays, sort_key

    # warmup / compile
    cnt = jnp.zeros((n_lanes,), jnp.int32)
    acc, rays_per_call, cnt = fused(0, cnt)
    acc.block_until_ready()
    rays_per_call = int(rays_per_call)

    t0 = time.perf_counter()
    for i in range(n_calls):
        # the returned key is the RUNNING SUM of lane counts when sorting
        # (a stationary-geometry estimate that sorts better than the last
        # dispatch alone: suzanne 38.5 -> 36.1 ms/pass)
        out, _, cnt = fused((i + 1) * passes_per_call, cnt)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    total_rays = rays_per_call * n_calls
    mray_s = total_rays / elapsed / 1e6
    samples_per_ms = n_pix * passes_per_call * n_calls / elapsed / 1e3
    return {
        "metric": f"{scene_name}_mray_per_s",
        "value": round(mray_s, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mray_s / TARGET_MRAY_S, 3),
        "samples_per_ms": round(samples_per_ms, 1),
        "ms_per_pass": round(elapsed / (n_calls * passes_per_call) * 1e3, 2),
    }


def main() -> int:
    # headline line first (the driver records line 1); mesh scenes after
    print(json.dumps(bench_scene("cornell")))
    for scene_name in ("suzanne", "ce"):
        print(json.dumps(bench_scene(scene_name)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
