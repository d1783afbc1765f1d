"""Component-level timing on the current JAX default platform (TPU).

Times each stage of the wavefront pass separately to find the bottleneck:
  - camera ray gen + RNG
  - sphere intersection
  - triangle intersection (matmul form)
  - winner gathers + shade info
  - material gather + direction sampling
  - full bounce
  - full pass

Usage: python tools/profile_components.py [n_rays] [scene]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import (
    PathState,
    bounce,
    gather_materials,
    sample_direction,
    trace_pass,
)
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.ops.camera import generate_rays
from pt_three_ways_tpu.ops.intersect import (
    _triangle_shade_info,
    intersect_scene,
    intersect_spheres,
    intersect_triangles,
)
from pt_three_ways_tpu.utils.render_params import RenderParams


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:9.3f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "cornell"
    params = RenderParams(width=256, height=256, seed=1)
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    scene = sb.build()
    print(f"scene={scene_name} tris={scene.num_triangles} "
          f"spheres={scene.num_spheres} rays={n}")

    key = rng.base_key(0)
    k1, k2 = jax.random.split(key)
    org = jax.random.uniform(k1, (3, n), jnp.float32, -1, 1)
    d = jax.random.normal(k2, (3, n), jnp.float32)
    dirn = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    org, dirn = jax.device_put(org), jax.device_put(dirn)
    eps = 1e-4

    timeit("rng uniforms [3,N]",
           jax.jit(lambda k: rng.uniforms(k, (3, n))), key)

    sph = scene.spheres
    timeit("sphere intersect",
           jax.jit(lambda o, di: intersect_spheres(
               o, di, sph.centre, sph.radius_sq, sph.centre_sq, eps)),
           org, dirn)

    tri = scene.triangles
    timeit("triangle intersect",
           jax.jit(lambda o, di: intersect_triangles(o, di, tri.woop, eps)),
           org, dirn)

    t_arr = jnp.full((n,), 2.0, jnp.float32)
    idx = jnp.zeros((n,), jnp.int32)
    timeit("triangle shade info (onehot)",
           jax.jit(lambda o, di: _triangle_shade_info(
               o, di, t_arr, idx, tri.woop, tri.normals, tri.mat_id)),
           org, dirn)

    timeit("full intersect_scene",
           jax.jit(lambda o, di: intersect_scene(scene, o, di, eps)),
           org, dirn)

    hits = jax.jit(lambda o, di: intersect_scene(scene, o, di, eps))(org, dirn)
    timeit("material gather",
           jax.jit(lambda h: gather_materials(scene.materials, h.mat_id)), hits)

    mats = gather_materials(scene.materials, hits.mat_id)
    u = rng.uniforms(key, (3, n))
    timeit("sample_direction",
           jax.jit(lambda m, h, di, uu: sample_direction(
               m, h, di, uu[0], uu[1], uu[2] < 0.5)),
           mats, hits, dirn, u)

    state = PathState(org=org, dirn=dirn, beta=jnp.ones((3, n)),
                      acc=jnp.zeros((3, n)), alive=jnp.ones((n,), bool))
    timeit("full bounce",
           jax.jit(lambda st, uu: bounce(
               scene, st, uu[0], uu[1], uu[2], eps, 1024)),
           state, u)

    # full pass on 256x256 (K=16 -> ~1M paths)
    npix = 256 * 256
    px = jnp.asarray(np.arange(npix, dtype=np.int32) % 256)
    py = jnp.asarray(np.arange(npix, dtype=np.int32) // 256)
    dt = timeit("full pass 256x256 K=16",
                jax.jit(lambda k: trace_pass(scene, camera, params, k, px, py)),
                key, iters=5)
    pparams = params.replace(intersector="pallas")
    dtp = timeit("full pass (pallas intersect)",
                 jax.jit(lambda k: trace_pass(scene, camera, pparams, k, px, py)),
                 key, iters=5)
    _, nrays = jax.jit(lambda k: trace_pass(
        scene, camera, params, k, px, py, with_ray_count=True))(key)
    print(f"live rays/pass {int(nrays)}  -> {int(nrays)/dt/1e6:.1f} Mray/s")
    lanes = npix * (1 + 16 * (params.max_depth - 1))
    print(f"lane-rays/pass {lanes}  -> {lanes/dt/1e6:.1f} Mlane/s")


if __name__ == "__main__":
    main()
