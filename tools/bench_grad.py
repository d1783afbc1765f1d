"""Forward+backward throughput on suzanne — the gradient leg of the
BASELINE eval configs.

Times, at the given resolution:
  1. the MEGAKERNEL forward (trace_passes_fused, per-scene tuned hints) —
     the production render speed, the yardstick the gradient paths are
     measured against;
  2. the legacy scan wavefront: forward, and value_and_grad with remat
     (round-2's training path, kill_dead_paths=False);
  3. the PATH-REPLAY fused path (models/replay.py): forward, and
     value_and_grad — round 3's training path (fused bounce_step chain
     forward, saved-winner shading replay backward).

Usage: python tools/bench_grad.py [res] [intersector]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from pt_three_ways_tpu.models.catalog import (
    FEEDBACK_SORT_HINT,
    PASSES_PER_DISPATCH_HINT,
    REGEN_TAIL_FRAC_HINT,
    create_scene,
)
from pt_three_ways_tpu.models.integrator import trace_pass, trace_passes_fused
from pt_three_ways_tpu.models.replay import trace_pass_replay
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


def _time(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ix = sys.argv[2] if len(sys.argv) > 2 else "auto"
    scene_name = "suzanne"
    base = RenderParams(width=res, height=res, seed=1, intersector=ix)
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, base)
    scene = sb.build()
    npix = res * res
    px = jnp.asarray(np.arange(npix, dtype=np.int32) % res)
    py = jnp.asarray(np.arange(npix, dtype=np.int32) // res)
    key = rng.base_key(0)
    target = jnp.zeros((npix, 3), jnp.float32)

    # --- 1. megakernel forward (production render, tuned) ---
    # S=32 state tables need render()'s memory tiling at >=512^2; the
    # whole-frame yardstick uses S=8 there (slightly pessimistic for the
    # megakernel — production tiles and keeps S=32)
    S = PASSES_PER_DISPATCH_HINT.get(scene_name, 8)
    if npix * base.first_bounce_samples * 16 * 4 * S > (2 << 30):
        S = 8
    p_mk = base.replace(
        samples_per_pixel=S,
        regen_feedback_sort=FEEDBACK_SORT_HINT.get(scene_name, False),
        regen_tail_frac=REGEN_TAIL_FRAC_HINT.get(scene_name, 0.0),
    )
    n_lanes = npix * p_mk.first_bounce_samples

    @jax.jit
    def mk_fwd(sample0, sort_key):
        rad, cnt = trace_passes_fused(
            scene, camera, p_mk, key, sample0, 0, px, py, S,
            sort_key=sort_key if p_mk.regen_feedback_sort else None,
            with_lane_counts=True,
        )
        return rad, sort_key + cnt

    cnt = jnp.zeros((n_lanes,), jnp.int32)
    _, (_, cnt) = _time(mk_fwd, 0, cnt, reps=1)  # warm + seed the sort
    ms, _ = _time(mk_fwd, S, cnt)
    mk_ms = ms / S
    print(f"suzanne {res}x{res} MEGAKERNEL fwd: {mk_ms:.1f} ms/pass", flush=True)

    # --- 2. legacy scan wavefront (round-2 training path) ---
    p_scan = base.replace(remat=True, kill_dead_paths=False, fused="off")
    fwd = jax.jit(lambda k: trace_pass(scene, camera, p_scan, k, px, py))
    fwd_ms, _ = _time(fwd, key)
    print(f"suzanne {res}x{res} scan fwd: {fwd_ms:.1f} ms "
          f"({fwd_ms / mk_ms:.2f}x megakernel)", flush=True)

    def loss_scan(mats, k):
        sc = scene._replace(materials=mats)
        img = trace_pass(sc, camera, p_scan, k, px, py)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_scan))
    try:
        scan_ms, (l0, g0) = _time(vg, scene.materials, key)
        print(f"suzanne {res}x{res} scan fwd+bwd (remat): {scan_ms:.1f} ms "
              f"({scan_ms / mk_ms:.2f}x megakernel fwd)", flush=True)
    except Exception as e:  # the legacy path OOMs at 512^2 (kill_dead off)
        scan_ms, l0, g0 = float("inf"), None, None
        print(f"suzanne {res}x{res} scan fwd+bwd: FAILED "
              f"({type(e).__name__}: {str(e)[:120]})", flush=True)

    # --- 3. path-replay fused path (round-3 training path) ---
    p_rep = base
    rep_fwd = jax.jit(
        lambda k: trace_pass_replay(scene, camera, p_rep, k, px, py)
    )
    rep_fwd_ms, _ = _time(rep_fwd, key)
    print(f"suzanne {res}x{res} replay fwd: {rep_fwd_ms:.1f} ms "
          f"({rep_fwd_ms / mk_ms:.2f}x megakernel)", flush=True)

    def loss_rep(mats, k):
        sc = scene._replace(materials=mats)
        img = trace_pass_replay(sc, camera, p_rep, k, px, py)
        return jnp.mean((img - target) ** 2)

    vg_rep = jax.jit(jax.value_and_grad(loss_rep))
    rep_ms, (l1, g1) = _time(vg_rep, scene.materials, key)
    print(
        f"suzanne {res}x{res} REPLAY fwd+bwd: {rep_ms:.1f} ms "
        f"({rep_ms / mk_ms:.2f}x megakernel fwd, "
        f"{scan_ms / rep_ms:.2f}x faster than scan), "
        f"loss={float(l1):.5f}"
        + (f" (scan {float(l0):.5f})" if l0 is not None else "")
        + f", |g.diffuse|={float(jnp.abs(g1.diffuse).sum()):.3e}"
        + (f" (scan {float(jnp.abs(g0.diffuse).sum()):.3e})"
           if g0 is not None else ""),
        flush=True,
    )

    # --- 4. REGENERATING multi-pass replay (round-5 training path) ---
    # S sample passes per dispatch with in-dispatch dead-lane refill;
    # residuals per REALIZED bounce; reverse-walk backward kernel.
    from pt_three_ways_tpu.models.replay import trace_passes_replay

    n_lanes_rep = npix * base.first_bounce_samples
    # residual capacity is RRES(16) rows x S*nb slots x 4 B/lane: keep the
    # buffer inside ~4 GB of HBM
    nb = base.max_depth - 1
    # S=16 is the scoped-VMEM ceiling for the residual-emitting forward
    # (RRES*S*nb rows x RT x 4 B double-buffered: 8 MB at S=16; S=32 needs
    # 18.76 MB > the 16 MB limit). HBM: measured fit at 512^2/S=8 is
    # resid 8.6 GB + d_state0 1.2 GB + state0 + camera-scan intermediates
    # ~ 12.6 GB of the 15.75 GB HBM -> 9 GB resid budget.
    S_rep = 16
    while S_rep > 1 and 64 * S_rep * nb * n_lanes_rep > (9 << 30):
        S_rep //= 2
    base_key = rng.base_key(1)

    # the feedback work-sort chains per-lane bounce counts across steps
    # (training params move slowly; per-lane expected depth is geometry)
    rg_fwd = jax.jit(
        lambda s0, sk: trace_passes_replay(
            scene, camera, base, base_key, s0, 0, px, py, S_rep,
            sort_key=sk, with_lane_counts=True,
        )
    )
    cnt = jnp.zeros((n_lanes_rep,), jnp.int32)
    _, c = jax.block_until_ready(rg_fwd(0, cnt))  # warm + seed the sort
    cnt = cnt + c
    rg_fwd_ms, (_, c) = _time(rg_fwd, S_rep, cnt)
    print(
        f"suzanne {res}x{res} REGEN-REPLAY fwd (S={S_rep}, sorted): "
        f"{rg_fwd_ms / S_rep:.1f} ms/pass "
        f"({rg_fwd_ms / S_rep / mk_ms:.2f}x megakernel)", flush=True)

    def loss_rg(mats, s0, sk):
        sc = scene._replace(materials=mats)
        img, cnts = trace_passes_replay(
            sc, camera, base, base_key, s0, 0, px, py, S_rep,
            sort_key=sk, with_lane_counts=True,
        )
        return jnp.mean((img / S_rep - target) ** 2), sk + cnts

    vg_rg = jax.jit(jax.value_and_grad(loss_rg, has_aux=True))
    (l2, cnt), g2 = jax.block_until_ready(
        vg_rg(scene.materials, 0, jnp.zeros((n_lanes_rep,), jnp.int32))
    )
    import time as _t

    # seed the feedback sort with a couple of steps before timing
    for i in range(2):
        (l2, cnt), g2 = vg_rg(scene.materials, (i + 1) * S_rep, cnt)
    np.asarray(g2.diffuse)
    t0 = _t.perf_counter()
    for i in range(2, 7):
        (l2, cnt), g2 = vg_rg(scene.materials, (i + 1) * S_rep, cnt)
    np.asarray(g2.diffuse)
    rg_ms = (_t.perf_counter() - t0) / 5 * 1e3
    print(
        f"suzanne {res}x{res} REGEN-REPLAY fwd+bwd (S={S_rep}, sorted): "
        f"{rg_ms / S_rep:.1f} ms/pass "
        f"({rg_ms / S_rep / mk_ms:.2f}x megakernel fwd, "
        f"{rep_ms / (rg_ms / S_rep):.2f}x faster than the per-pass replay), "
        f"loss={float(l2):.5f}, "
        f"|g.diffuse|={float(jnp.abs(g2.diffuse).sum()):.3e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
