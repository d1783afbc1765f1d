"""Streaming megakernel (ops/pallas_megakernel._stream_tri): triangles
DMA'd HBM->VMEM in WSTREAM windows with per-window AABB skip and in-loop
attribute capture — the over-VMEM-budget tier (>~15k triangles).

The gate is BIT-EQUALITY with the resident krng kernel on a scene that fits
both: the capture is the same bf16x3 one-hot contraction as the resident
gather, and window padding rows carry all-zero woop rows (parallel-
rejected), so the streamed path must reproduce the resident results
exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models import integrator as I
from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import kernel_rng, rng
from pt_three_ways_tpu.ops.pallas_megakernel import (
    PackedSceneFused,
    PackedSceneStream,
    fused_passes_krng,
)
from pt_three_ways_tpu.utils.render_params import RenderParams


def _setup(scene_name="suzanne", w=24, S=3):
    params = RenderParams(
        width=w, height=w, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=5, seed=7, intersector="pallas-interpret",
    )
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    scene = sb.build()
    n = w * w
    px = jnp.asarray(np.arange(n, dtype=np.int32) % w)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // w)
    key = rng.base_key(params.seed)
    states = []
    for s in range(S):
        k = jax.random.fold_in(jax.random.fold_in(key, s), 0)
        st, _, _ = I._first_bounce_state(
            scene, camera, params, k, px, py, 1024, "pallas-interpret",
            want_unif=False, row_pad=10,
        )
        states.append(st)
    state0 = jnp.concatenate(states, axis=0)
    k4 = params.first_bounce_samples
    lane_ids = (
        (py * w + px).astype(jnp.int32)[:, None] * k4
        + jnp.arange(k4, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    kw = kernel_rng.key_words(rng.stream_key(key, rng.KERNEL_RNG_STREAM))
    return scene, params, state0, lane_ids, kw


def test_stream_bitwise_matches_resident_suzanne():
    scene, params, state0, lane_ids, kw = _setup("suzanne")
    nb = params.max_depth - 1
    a, ca = fused_passes_krng(
        PackedSceneFused(scene), scene.environment, state0, lane_ids, kw,
        0, params.epsilon, nb, 3, interpret=True,
    )
    b, cb = fused_passes_krng(
        PackedSceneStream(scene), scene.environment, state0, lane_ids, kw,
        0, params.epsilon, nb, 3, interpret=True, stream=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_stream_bitwise_matches_resident_mixed_prims():
    # ISOLATED in a fresh interpreter: after ~180 suite tests the XLA CPU
    # backend segfaults inside backend_compile_and_load on exactly this
    # kernel's HLO (reproducible twice at the same point, never in a
    # fresh process, 121 GB free — an upstream compiler-state bug, not
    # ours). A subprocess gives the fresh-process behaviour
    # deterministically.
    import os
    import subprocess
    import sys

    if os.environ.get("PT3_STREAM_SUBTEST") != "1":
        env = dict(os.environ, PT3_STREAM_SUBTEST="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q",
             __file__ + "::test_stream_bitwise_matches_resident_mixed_prims"],
            capture_output=True, text=True, timeout=900, env=env,
        )
        assert r.returncode == 0, (
            f"isolated run failed rc={r.returncode}:\n"
            f"{r.stdout[-2000:]}\n{r.stderr[-1000:]}"
        )
        return
    # cornell: triangles AND a sphere winner mix (sphere gather reuses the
    # capture scratch after the snapshot — ordering must hold)
    scene, params, state0, lane_ids, kw = _setup("cornell", w=16, S=2)
    nb = params.max_depth - 1
    a, ca = fused_passes_krng(
        PackedSceneFused(scene), scene.environment, state0, lane_ids, kw,
        0, params.epsilon, nb, 2, interpret=True,
    )
    b, cb = fused_passes_krng(
        PackedSceneStream(scene), scene.environment, state0, lane_ids, kw,
        0, params.epsilon, nb, 2, interpret=True, stream=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_stream_table_layout_matches_gather_rows():
    """tri_all column r must equal tri_coef row r (the capture/gather
    equivalence contract)."""
    scene, *_ = _setup("suzanne")
    fused = PackedSceneFused(scene)
    stream = PackedSceneStream(scene)
    coef = sum(jnp.asarray(c, jnp.float32) for c in fused.tri_coef)
    n = fused.n_tri
    np.testing.assert_array_equal(
        np.asarray(stream.tri_all[:n, :30]),
        np.asarray(coef[:30, :n]).T,
    )


def test_uses_stream_routing():
    from pt_three_ways_tpu.models.integrator import uses_stream

    params = RenderParams(width=8, height=8, intersector="pallas-interpret")
    sb = SceneBuilder()
    create_scene(sb, "suzanne", params)
    small = sb.build()
    assert not uses_stream(params, small)  # fits the resident tables
    sb4 = SceneBuilder()
    create_scene(sb4, "suzanne-sub3", params)
    big = sb4.build()
    assert uses_stream(params, big)
    assert not uses_stream(params.replace(rng_mode="table"), big)
    assert not uses_stream(params.replace(fused="off"), big)


def test_stream_dispatch_caps():
    """Stream-tier dispatches are bounded by the kernel wall-clock budget
    (the TPU runtime faults kernels past tens of seconds — VALIDATION.md
    round 4): rows-per-tile shrinks with triangle count x pass-group size,
    and render()'s ppd clamp keeps even one pixel row inside the budget."""
    import jax

    from pt_three_ways_tpu.models.render import _tile_rows

    params = RenderParams(
        width=256, height=256, samples_per_pixel=64,
        intersector="pallas-interpret",
    )
    sb = SceneBuilder()
    create_scene(sb, "suzanne-sub3", params)
    big = sb.build()
    k = params.first_bounce_samples
    t = big.num_triangles
    for ppd in (8, 32):
        rows = _tile_rows(params, ppd, regen=True, scene=big)
        lanes = rows * params.width * k
        assert lanes * ppd * t <= 4.0e9 + params.width * k * ppd * t, (
            "stream dispatch exceeds the wall-clock budget"
        )
    small_sb = SceneBuilder()
    create_scene(small_sb, "suzanne", params)
    small = small_sb.build()
    assert _tile_rows(params, 8, regen=True, scene=small) >= _tile_rows(
        params, 8, regen=True, scene=big
    )
