"""Sharded-path perf evidence on ONE real chip (VERDICT round-3 missing #3).

Measures, on the real device:
  1. plain render() wall for suzanne at the bench config;
  2. render_sharded() on a degenerate mesh (dp=1, sp=1) — the sharding
     machinery's overhead must be <5% of plain render;
  3. the sharded replay TRAIN step wall at the given resolution
     (parallel/train.make_sharded_train_step on the (1,1) mesh).

The multi-chip scaling claim itself is validated functionally on the
virtual 8-device CPU mesh (tests/test_sharding.py, __graft_entry__
.dryrun_multichip) and analytically by tools/scaling_model.py — this
script supplies the measured single-chip anchor those models scale from.

Usage: python tools/bench_sharded.py [scene] [size] [spp]
"""

from __future__ import annotations

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

from pt_three_ways_tpu.models.catalog import (
    FEEDBACK_SORT_HINT,
    PASSES_PER_DISPATCH_HINT,
    REGEN_TAIL_FRAC_HINT,
    create_scene,
    hint_key,
)
from pt_three_ways_tpu.models.render import render
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.parallel.mesh import make_mesh
from pt_three_ways_tpu.parallel.shard import render_sharded
from pt_three_ways_tpu.utils.render_params import RenderParams


def main() -> int:
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "suzanne"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    hk = hint_key(scene_name)
    params = RenderParams(
        width=size, height=size, samples_per_pixel=spp, seed=1,
        passes_per_dispatch=PASSES_PER_DISPATCH_HINT.get(hk, 0),
        regen_feedback_sort=FEEDBACK_SORT_HINT.get(hk, False),
        regen_tail_frac=REGEN_TAIL_FRAC_HINT.get(hk, 0.0),
    )
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    scene = sb.build()

    def timed(label, fn, reps=2):
        fn()  # warm (compile)
        fn()  # second warm: the train step compiles a second program at
        #       step 1 (optimizer state shape settles)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        wall = (time.perf_counter() - t0) / reps
        print(f"{label}: {wall:.3f} s "
              f"({size*size*spp/wall/1e3:.1f} samples/ms)", flush=True)
        return wall

    plain = timed(
        f"plain render        {scene_name} {size}²@{spp}spp",
        lambda: render(scene, camera, params),
    )
    mesh = make_mesh(n_devices=1, dp=1)
    sharded = timed(
        f"render_sharded(1,1) {scene_name} {size}²@{spp}spp",
        lambda: render_sharded(scene, camera, params, mesh),
    )
    ovh = (sharded - plain) / plain * 100
    print(f"sharded overhead vs plain: {ovh:+.1f}%  "
          f"({'PASS' if ovh < 5 else 'FAIL'} <5% gate)", flush=True)

    # sharded replay train step at the same resolution
    from pt_three_ways_tpu.ops import rng as _rng
    from pt_three_ways_tpu.parallel.train import (
        TrainState, make_sharded_train_step,
    )

    tparams = params.replace(samples_per_pixel=1)
    step = make_sharded_train_step(scene, tparams, mesh, learning_rate=0.01)
    n = size * size
    px = jnp.asarray(np.arange(n, dtype=np.int32) % size)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // size)
    target = jnp.zeros((n, 3), jnp.float32)
    state = TrainState(scene.materials, camera, jnp.int32(0))
    key = _rng.base_key(11)

    holder = {"state": state, "i": 0}

    def one_step():
        holder["i"] += 1
        loss, holder["state"] = step(
            holder["state"], jax.random.fold_in(key, holder["i"]),
            px, py, target,
        )
        jax.block_until_ready(loss)
        return loss

    timed(f"sharded train step  {scene_name} {size}² (fwd+bwd+update)",
          one_step, reps=3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
