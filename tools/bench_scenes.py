"""Per-scene ms/pass + Mray/s probe for kernel iteration.

Times the fused multi-pass program (same methodology as bench.py: one
compiled executable, warmup call, then amortised timed calls) on any scene.

Usage: python tools/bench_scenes.py [scene ...] [--size 256] [--passes 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


def bench_scene(scene_name: str, size: int, passes: int, n_calls: int = 4):
    params = RenderParams(width=size, height=size, samples_per_pixel=passes,
                          seed=1)
    builder = SceneBuilder()
    camera = create_scene(builder, scene_name, params)
    scene = builder.build()

    n_pix = size * size
    px = jnp.asarray(np.arange(n_pix, dtype=np.int32) % size)
    py = jnp.asarray(np.arange(n_pix, dtype=np.int32) // size)
    base = rng.base_key(params.seed)

    from pt_three_ways_tpu.models.integrator import (
        resolve_intersector,
        trace_passes_fused,
    )

    use_regen = (
        resolve_intersector(params).startswith("pallas")
        and params.fused != "off"
    )

    @jax.jit
    def fused(sample0):
        if use_regen:
            return trace_passes_fused(
                scene, camera, params, base, sample0, 0, px, py, passes,
                with_ray_count=True,
            )

        def body(i, carry):
            acc, rays = carry
            key = jax.random.fold_in(jax.random.fold_in(base, sample0 + i), 0)
            rad, nr = trace_pass(
                scene, camera, params, key, px, py, with_ray_count=True,
            )
            return acc + rad, rays + nr

        return jax.lax.fori_loop(
            0, passes, body,
            (jnp.zeros((n_pix, 3), jnp.float32), jnp.int32(0)),
        )

    t0 = time.perf_counter()
    acc, rays_per_call = fused(0)
    acc.block_until_ready()
    compile_s = time.perf_counter() - t0
    rays_per_call = int(rays_per_call)

    t0 = time.perf_counter()
    for i in range(n_calls):
        out, _ = fused((i + 1) * passes)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    ms_per_pass = elapsed / (n_calls * passes) * 1e3
    mray_s = rays_per_call * n_calls / elapsed / 1e6
    samples_per_ms = n_pix * passes * n_calls / elapsed / 1e3
    return {
        "scene": scene_name,
        "size": size,
        "ms_per_pass": round(ms_per_pass, 2),
        "mray_per_s": round(mray_s, 2),
        "samples_per_ms": round(samples_per_ms, 1),
        "warmup_s": round(compile_s, 1),
        "mean": float(np.asarray(acc).mean() / passes),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=["cornell", "suzanne", "ce"])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--calls", type=int, default=4)
    args = ap.parse_args(argv)
    for s in args.scenes or ["cornell", "suzanne", "ce"]:
        print(json.dumps(bench_scene(s, args.size, args.passes, args.calls)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
