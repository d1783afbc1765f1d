"""End-to-end inverse rendering on hardware: recover perturbed material
albedos from a rendered target, through the round-5 REGENERATING replay
chain (models/replay.trace_passes_replay) with an Adam loop.

This is the "training" counterpart of the CLI render demo: the same
estimator the renderer ships is differentiated at production speed
(regen-replay fwd+bwd ~= 1.8-2x the render forward per sample pass,
tools/bench_grad.py). The reference has no gradients at all; the
recursion being differentiated is src/oo/Renderer.cpp:60-141.

Identifiability note: a diffuse row hidden behind a near-pure specular
surface (cornell's mirror sphere: |dL/d(diffuse)| ~ 2e-4 vs ~0.4 for the
walls) cannot be recovered from the image by ANY method — the recovery
metric therefore covers the observable rows (gradient magnitude at the
perturbed start above 1e-3).

Usage: python tools/train_demo.py [steps] [res]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_passes_fused
from pt_three_ways_tpu.models.replay import trace_passes_replay
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spp_target = 256
    S = 16  # regen-replay block size (scoped-VMEM ceiling)
    params = RenderParams(width=res, height=res, samples_per_pixel=S, seed=3)
    sb = SceneBuilder()
    camera = create_scene(sb, "cornell", params)
    scene = sb.build()
    n = res * res
    px = jnp.asarray(np.arange(n, dtype=np.int32) % res)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // res)
    base = rng.base_key(3)

    # ground-truth TARGET via the production forward
    tgt = jnp.zeros((n, 3), jnp.float32)
    fwd = jax.jit(lambda s0: trace_passes_fused(
        scene, camera, params, base, s0, 0, px, py, S))
    for i in range(spp_target // S):
        tgt = tgt + fwd(i * S)
    target = tgt / spp_target

    # perturb the diffuse albedos (multiplicative, clipped physical)
    gen = np.random.default_rng(0)
    true_diffuse = np.asarray(scene.materials.diffuse)
    pert = np.clip(
        true_diffuse * gen.uniform(0.4, 1.6, size=true_diffuse.shape),
        0.02, 0.98,
    )
    pert = np.where(true_diffuse == 0.0, true_diffuse, pert)
    d0 = jnp.asarray(pert, jnp.float32)

    def loss_fn(diffuse, key):
        sc = scene._replace(
            materials=scene.materials._replace(diffuse=diffuse)
        )
        img = trace_passes_replay(sc, camera, params, key, 0, 0, px, py, S)
        return jnp.mean((img / S - target) ** 2)

    opt = optax.adam(3e-2)

    @jax.jit
    def step_fn(diffuse, opt_state, key):
        loss, g = jax.value_and_grad(loss_fn)(diffuse, key)
        updates, opt_state = opt.update(g, opt_state, diffuse)
        diffuse = jnp.clip(diffuse + updates, 0.0, 0.98)
        return loss, g, diffuse, opt_state

    # observability mask from the starting gradient
    g0 = jax.grad(loss_fn)(d0, jax.random.fold_in(base, 999))
    obs = np.abs(np.asarray(g0)).sum(axis=1) > 1e-3
    print(f"observable diffuse rows: {obs.sum()}/{obs.size} "
          f"(hidden rows are behind near-pure specular surfaces)")

    def err(d):
        return float(np.abs(np.asarray(d) - true_diffuse)[obs].mean())

    diffuse, opt_state = d0, opt.init(d0)
    err0, loss0 = err(d0), None
    t0 = time.perf_counter()
    for i in range(steps):
        key = jax.random.fold_in(base, 1000 + i)
        loss, g, diffuse, opt_state = step_fn(diffuse, opt_state, key)
        if i == 0:
            loss0 = float(loss)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:4d}: loss {float(loss):.6f}  "
                  f"observable |albedo err| {err(diffuse):.4f}", flush=True)
    wall = time.perf_counter() - t0
    err1 = err(diffuse)
    print(f"observable albedo error {err0:.4f} -> {err1:.4f} "
          f"({err0 / max(err1, 1e-9):.1f}x reduction), "
          f"loss {loss0:.6f} -> {float(loss):.6f}, "
          f"{wall / steps * 1e3:.0f} ms/step = "
          f"{wall / steps / S * 1e3:.1f} ms per fwd+bwd sample pass "
          f"({steps} steps, {wall:.1f}s wall)")
    assert err1 < err0 * 0.35, "albedo did not recover"
    print("RECOVERED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
