"""Headline benchmark: Cornell Box wavefront rays/second on one chip.

Prints one JSON line per scene; the HEADLINE line (cornell vs the 50 Mray/s
north-star target) is printed LAST because the driver's capture parses the
final line of output.

Baselines:
  * cornell / suzanne: the 50 Mray/s/chip north-star target (BASELINE.md).
    The reference itself publishes no numbers (its README disclaims
    performance), so the target is the driver-specified goal.
  * ce / suzanne-sub4: MEASURED single-thread C++ reference samples/ms on
    this container (tools/refgate/refdod, unmodified reference sources,
    -O3 -march=native; see _CPP_SAMPLES_PER_MS below). ce's zero-beta
    emissive kill collapses paths to ~1 bounce, so its live-ray Mray/s
    cannot regress meaningfully — samples/ms is the honest metric there,
    and sub4's 248k triangles are far beyond the Mray/s target's scope.

Rays counted are LIVE rays: camera rays plus alive path lanes entering each
bounce (dead/masked/zero-throughput lanes are excluded even when the
wavefront still dispatches them).

Resilience: the TPU relay backend occasionally fails to initialize
(round-2's driver capture died with "Unable to initialize backend 'axon':
UNAVAILABLE" before any number was printed). The measurement therefore runs
in a WORKER subprocess; this parent retries a fresh worker up to
MAX_ATTEMPTS times with BACKOFF_S sleep between attempts (a fresh process
sidesteps any poisoned in-process backend cache). On final failure a
structured JSON error line is printed so the driver's capture is never
`parsed: null`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

MAX_ATTEMPTS = 5
BACKOFF_S = 60
WORKER_TIMEOUT_S = 3000  # first compile can be slow on a cold cache


def _parent() -> int:
    """Retry loop: launch the worker until it produces valid JSON lines."""
    last_tail = ""
    for attempt in range(1, MAX_ATTEMPTS + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                timeout=WORKER_TIMEOUT_S,
                text=True,
            )
            out, rc = proc.stdout, proc.returncode
            last_tail = (proc.stderr or "")[-2000:]
        except subprocess.TimeoutExpired as e:
            out, rc = (e.stdout or ""), -1
            last_tail = f"worker timed out after {WORKER_TIMEOUT_S}s"
        lines = [l for l in out.splitlines() if l.strip()]
        parsed = []
        for l in lines:
            try:
                d = json.loads(l)
                if isinstance(d, dict) and "metric" in d:
                    parsed.append(l)
            except (json.JSONDecodeError, ValueError):
                pass
        if rc == 0 and parsed:
            for l in parsed:
                print(l)
            return 0
        sys.stderr.write(
            f"bench attempt {attempt}/{MAX_ATTEMPTS} failed "
            f"(rc={rc}); stderr tail:\n{last_tail}\n"
        )
        if attempt < MAX_ATTEMPTS:
            time.sleep(BACKOFF_S)
    # Final failure: emit a structured line so the capture parses.
    print(
        json.dumps(
            {
                "metric": "cornell_mray_per_s",
                "value": 0.0,
                "unit": "Mray/s",
                "vs_baseline": 0.0,
                "error": f"all {MAX_ATTEMPTS} attempts failed: "
                + last_tail.splitlines()[-1][:300]
                if last_tail
                else "unknown",
            }
        )
    )
    return 1


if __name__ == "__main__" and "--worker" not in sys.argv:
    sys.exit(_parent())

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
    REGEN_TAIL_FRAC_HINT,
    RNG_MODE_HINT,
)
TARGET_MRAY_S = 50.0

# Measured single-thread C++ reference throughput on THIS container
# (tools/refgate/refdod = unmodified reference math/util/dod sources,
# g++ -O3 -march=native -funsafe-math-optimizations; scenes dumped by
# tools/dump_scene.py so the geometry is identical). Round-4 measurements:
#   ce:            256x256 @8spp  (7 effective passes) -> 458,752 samples
#                  in 661.4 s = 0.694 samples/ms
#   suzanne-sub4:  64x64 @2spp (1 effective pass) -> 4,096 samples in
#                  387.4 s wall minus 183.8 s one-time scene build
#                  (measured by an 0-effective-pass run) = 0.0202 samples/ms
# vs_baseline for these scenes = our samples/ms / this figure.
_CPP_SAMPLES_PER_MS = {
    "ce": 0.694,
    "suzanne-sub4": 0.0202,
}


def bench_scene(scene_name: str, n_calls: int = 6, width: int = 0,
                passes_per_call: int = 0):
    passes_per_call = passes_per_call or PASSES_PER_SCENE.get(scene_name, 8)
    width = width or WIDTH
    params = RenderParams(
        width=width, height=width, samples_per_pixel=passes_per_call, seed=1,
        regen_tail_frac=REGEN_TAIL_FRAC_HINT.get(scene_name, 0.0),
        rng_mode=RNG_MODE_HINT.get(scene_name, "auto"),
    )
    builder = SceneBuilder()
    camera = create_scene(builder, scene_name, params)
    scene = builder.build()

    n_pix = width * width
    px = jnp.asarray(np.arange(n_pix, dtype=np.int32) % width)
    py = jnp.asarray(np.arange(n_pix, dtype=np.int32) // width)
    base = rng.base_key(params.seed)

    # ONE compiled program per call: the regenerating megakernel traces all
    # passes_per_call samples in a single dispatch on TPU (dead lanes refill
    # with the next sample); elsewhere fall back to a fori over passes.
    # resolve_intersector(params, scene) also applies the scene-size VMEM
    # tiering, so over-budget meshes (suzanne-sub3+) route to the XLA scan.
    from pt_three_ways_tpu.models.integrator import trace_passes_fused
    from pt_three_ways_tpu.models.render import uses_regen

    use_regen = uses_regen(params, "dod", scene)
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
    cpp = _CPP_SAMPLES_PER_MS.get(scene_name)
    if cpp:
        # measured-C++ baseline scenes: samples/ms is the honest metric
        # (see module docstring)
        return {
            "metric": f"{scene_name}_samples_per_ms",
            "value": round(samples_per_ms, 1),
            "unit": "samples/ms",
            "vs_baseline": round(samples_per_ms / cpp, 1),
            "baseline_cpp_samples_per_ms": cpp,
            "mray_per_s": round(mray_s, 2),
            "ms_per_pass": round(elapsed / (n_calls * passes_per_call) * 1e3, 2),
        }
    return {
        "metric": f"{scene_name}_mray_per_s",
        "value": round(mray_s, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mray_s / TARGET_MRAY_S, 3),
        "samples_per_ms": round(samples_per_ms, 1),
        "ms_per_pass": round(elapsed / (n_calls * passes_per_call) * 1e3, 2),
    }


def main() -> int:
    # fail fast if the backend is down (cheap probe before any big compile)
    jnp.ones((8, 8)).sum().block_until_ready()
    # mesh scenes first; the HEADLINE cornell line prints LAST (the
    # driver's capture parses the final line). bbc-owl (100 glossy spheres
    # + DoF, scripts/bench-st-owl.sh config) and example1 (fixed-refl +
    # DoF) regression-gate the glossy/thin-lens kernel paths (VERDICT r4
    # weak #6).
    for scene_name in ("suzanne", "ce", "bbc-owl", "example1"):
        print(json.dumps(bench_scene(scene_name)), flush=True)
    # scene-SIZE scaling line: 248k-triangle subdivided suzanne (identical
    # image), rendered by the STREAMING megakernel tier (HBM-windowed
    # triangles) — small frame / 8-pass groups inside the stream dispatch
    # budget
    print(
        json.dumps(
            bench_scene("suzanne-sub4", n_calls=2, width=128,
                        passes_per_call=8)
        ),
        flush=True,
    )
    print(json.dumps(bench_scene("cornell")), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
