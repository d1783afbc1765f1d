"""Dead-lane waste measurement for the wavefront/megakernel.

Replays one sample pass bounce by bounce (same masks as the integrator) and
reports, per bounce and in total:

  * live lanes (useful work),
  * lanes dispatched by the megakernel = lanes in RT-tiles containing at
    least one live lane (fully dead tiles are skipped by the kernel's
    pl.when early-outs; partially dead tiles still burn their dead lanes),
  * waste = (dispatched - live) / dispatched.

Usage: python tools/measure_waste.py [scene ...] [--size 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models import integrator as I
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.ops.camera import generate_rays
from pt_three_ways_tpu.ops.intersect import Hits, intersect_scene
from pt_three_ways_tpu.ops.pallas_intersect import RT
from pt_three_ways_tpu.utils.render_params import RenderParams


def measure(scene_name: str, size: int):
    params = RenderParams(width=size, height=size, seed=1)
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    scene = sb.build()
    nu, nv = params.first_bounce_u_samples, params.first_bounce_v_samples
    k = nu * nv
    n = size * size
    px = jnp.asarray(np.arange(n, dtype=np.int32) % size)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // size)
    key = rng.pass_key(rng.base_key(params.seed), 0)
    dtype = camera.centre.dtype
    eps = params.epsilon

    cam_u = rng.uniforms(rng.stream_key(key, rng.CAMERA_STREAM), (4, n), dtype)
    org0, dir0 = generate_rays(camera, px, py, cam_u)
    hits0 = intersect_scene(scene, org0, dir0, eps, 1024, "xla")
    mat0 = I.gather_materials(scene.materials, hits0.mat_id)

    fb_u = rng.uniforms(
        rng.stream_key(key, rng.FIRST_BOUNCE_STREAM), (3, n, k), dtype
    )
    iu = (jnp.arange(k, dtype=dtype) // nv).reshape(1, k)
    iv = (jnp.arange(k, dtype=dtype) % nv).reshape(1, k)
    u0 = (iu + fb_u[0]) / nu
    v0 = (iv + fb_u[1]) / nv
    p0 = fb_u[2]
    refl0 = I.effective_reflectivity(mat0, hits0, dir0)
    spec0 = (p0 < refl0[:, None]).reshape(-1)
    expand = lambda x: jnp.repeat(x, k, axis=-1)
    hits0x = Hits(*(expand(f) for f in hits0))
    mat0x = I.GatheredMat(*(expand(f) for f in mat0))
    dir1 = I.sample_direction(
        mat0x, hits0x, expand(dir0), u0.reshape(-1), v0.reshape(-1), spec0
    )
    beta1 = jnp.where(
        spec0, jnp.ones((3, n * k), dtype), mat0x.diffuse
    ) * I.branch_weight(expand(refl0), spec0)
    alive1 = hits0x.hit & jnp.any(beta1 != 0.0, axis=0)
    state = I.PathState(hits0x.pos, dir1, beta1, jnp.zeros((3, n * k), dtype),
                        alive1)

    total_lanes = disp_lanes = live_lanes = 0
    rows = []
    bkey = rng.stream_key(key, rng.BOUNCE_STREAM_BASE)
    for d in range(1, max(params.max_depth - 1, 0) + 1):
        alive = np.asarray(state.alive)
        pad = (-alive.size) % RT
        tiles = np.pad(alive, (0, pad)).reshape(-1, RT)
        active = tiles.any(axis=1)
        disp = int(active.sum()) * RT
        live = int(alive.sum())
        rows.append((d, live, disp, alive.size))
        total_lanes += alive.size
        disp_lanes += disp
        live_lanes += live
        bu = rng.uniforms(jax.random.fold_in(bkey, d), (3, n * k), dtype)
        state = I.bounce(scene, state, bu[0], bu[1], bu[2], eps, 1024, "xla")

    print(f"== {scene_name} {size}x{size} K={k} ==")
    for d, live, disp, lanes in rows:
        w = (disp - live) / max(disp, 1)
        print(f"  bounce {d}: live {live:>8}  dispatched {disp:>8} "
              f"(of {lanes}) waste-in-dispatched {w*100:5.1f}%")
    waste = (disp_lanes - live_lanes) / max(disp_lanes, 1)
    masked = (total_lanes - live_lanes) / max(total_lanes, 1)
    print(f"  TOTAL: dispatched waste {waste*100:.1f}% "
          f"(naive masked-lane waste would be {masked*100:.1f}%)")
    return waste


def measure_regen(scene_name: str, size: int, s_count: int):
    """Waste under the regenerating megakernel: each grid tile's while-loop
    runs max-over-lanes(total live bounces) iterations; a lane idles only
    after exhausting all its samples.  The kernel's cnt output IS the
    per-lane live-bounce total, so waste is exact:
        1 - sum(cnt) / sum_tiles(RT * max(cnt in tile)).
    """
    from pt_three_ways_tpu.ops.pallas_megakernel import (
        PackedSceneFused,
        fused_passes,
    )

    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas" if on_tpu else "pallas-interpret"
    params = RenderParams(width=size, height=size, seed=1,
                          intersector=backend)
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    scene = sb.build()
    n = size * size
    px = jnp.asarray(np.arange(n, dtype=np.int32) % size)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // size)
    base = rng.base_key(params.seed)
    nb = max(params.max_depth - 1, 0)

    packed = PackedSceneFused(scene)
    states, unifs = [], []
    for s in range(s_count):
        key = jax.random.fold_in(jax.random.fold_in(base, s), 0)
        st_rows, _, unif_rows = I._first_bounce_state(
            scene, camera, params, key, px, py, 1024, backend
        )
        states.append(st_rows)
        unifs.append(unif_rows)
    _, cnt = fused_passes(
        packed, scene.environment, jnp.concatenate(states, axis=0),
        jnp.concatenate(unifs, axis=0), params.epsilon, nb, s_count,
        interpret=not on_tpu,
    )
    cnt = np.asarray(cnt)
    pad = (-cnt.size) % RT
    tiles = np.pad(cnt, (0, pad)).reshape(-1, RT)
    iters = tiles.max(axis=1)
    disp = int((iters * RT).sum())
    live = int(cnt.sum())
    waste = (disp - live) / max(disp, 1)
    print(f"== {scene_name} {size}x{size} REGEN S={s_count} ==")
    print(f"  live bounce-lanes {live}  dispatched {disp}  "
          f"waste {waste*100:.1f}%  (mean tile iters {iters.mean():.1f}, "
          f"max {iters.max()})")
    return waste


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=["cornell", "suzanne", "ce"])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--regen", action="store_true",
                    help="measure the regenerating multi-pass kernel")
    ap.add_argument("--passes", type=int, default=8)
    args = ap.parse_args(argv)
    for s in args.scenes or ["cornell", "suzanne", "ce"]:
        if args.regen:
            measure_regen(s, args.size, args.passes)
        else:
            measure(s, args.size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
