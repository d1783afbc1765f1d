"""Forward+backward (path-replay) throughput on suzanne — the gradient leg
of the BASELINE eval configs.

Times: forward-only pass, value_and_grad w.r.t. the material table with
remat (path-replay) on suzanne at the given resolution.

Usage: python tools/bench_grad.py [res]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ix = sys.argv[2] if len(sys.argv) > 2 else "auto"
    params = RenderParams(width=res, height=res, seed=1, remat=True, intersector=ix)
    sb = SceneBuilder()
    camera = create_scene(sb, "suzanne", params)
    scene = sb.build()
    npix = res * res
    px = jnp.asarray(np.arange(npix, dtype=np.int32) % res)
    py = jnp.asarray(np.arange(npix, dtype=np.int32) // res)
    key = rng.base_key(0)
    target = jnp.zeros((npix, 3), jnp.float32)

    fwd = jax.jit(lambda k: trace_pass(scene, camera, params, k, px, py))
    out = jax.block_until_ready(fwd(key))
    t0 = time.perf_counter()
    for i in range(5):
        out = fwd(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    fwd_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"suzanne {res}x{res} fwd pass: {fwd_ms:.1f} ms", flush=True)

    def loss(mats, k):
        sc = scene._replace(materials=mats)
        img = trace_pass(sc, camera, params, k, px, py)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    l, g = vg(scene.materials, key)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for i in range(5):
        l, g = vg(scene.materials, jax.random.fold_in(key, i))
    jax.block_until_ready(g)
    bwd_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(
        f"suzanne {res}x{res} fwd+bwd (remat): {bwd_ms:.1f} ms "
        f"({bwd_ms / fwd_ms:.2f}x fwd), loss={float(l):.5f}, "
        f"|g.diffuse|={float(jnp.abs(g.diffuse).sum()):.3e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
