"""On-hardware smoke tests for the Mosaic-compiled kernels.

The main suite (tests/) runs on a virtual CPU mesh and exercises the Pallas
kernels in interpret mode only; this suite compiles the REAL kernels on the
attached TPU and gates them against the XLA reference path. Run on a TPU
host via ``make test-tpu`` (kept outside tests/ because tests/conftest.py
forces the CPU platform).
"""

import os

import pytest

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("requires TPU hardware", allow_module_level=True)

import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.ops.intersect import intersect_scene
from pt_three_ways_tpu.utils.render_params import RenderParams


def build(scene_name="cornell", size=64):
    params = RenderParams(
        width=size, height=size, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=3,
    )
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    return sb.build(), camera, params


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne"])
def test_compiled_intersector_matches_xla(scene_name):
    scene, camera, params = build(scene_name)
    n = 2048
    r = np.random.default_rng(5)
    org = jnp.asarray(r.normal(1.0, 2.0, size=(3, n)).astype(np.float32))
    d = r.normal(size=(3, n))
    d /= np.linalg.norm(d, axis=0)
    dirn = jnp.asarray(d.astype(np.float32))
    hx = intersect_scene(scene, org, dirn, params.epsilon, backend="xla")
    hp = intersect_scene(scene, org, dirn, params.epsilon, backend="pallas")
    hx_t, hp_t = np.asarray(hx.t), np.asarray(hp.t)
    hit = np.isfinite(hx_t)
    # FMA ordering differs; near-ties may flip a handful of winners
    assert (np.isfinite(hp_t) != hit).mean() < 0.01
    both = hit & np.isfinite(hp_t)
    np.testing.assert_allclose(hp_t[both], hx_t[both], rtol=5e-4)


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne"])
def test_compiled_regen_matches_pass_sum(scene_name):
    """The Mosaic-compiled regenerating multi-pass kernel equals the sum of
    single passes over the same key chain (tests/test_megakernel.py proves
    this in interpret mode; this gates the real compile).

    rng_mode="table" is the bit-compat bridge to the scan path — the
    default in-kernel counter RNG is a DIFFERENT stream by construction
    and is gated statistically (tests/test_kernel_rng.py). This pin was
    missing when krng became the auto default in round 3; the suite was
    not re-run on hardware then and the latent mismatch surfaced in
    round 4."""
    from pt_three_ways_tpu.models.integrator import trace_passes_fused

    scene, camera, params = build(scene_name, size=32)
    params = params.replace(rng_mode="table")
    n = params.width * params.height
    px = jnp.asarray(np.arange(n, dtype=np.int32) % params.width)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // params.width)
    base = rng.base_key(params.seed)
    S = 2
    fused = np.asarray(
        trace_passes_fused(scene, camera, params, base, 0, 0, px, py, S)
    )
    expect = np.zeros((n, 3), np.float64)
    for s in range(S):
        key = jax.random.fold_in(jax.random.fold_in(base, s), 0)
        expect += np.asarray(
            trace_pass(scene, camera, params, key, px, py), np.float64
        )
    assert np.isfinite(fused).all()
    close = np.isclose(fused, expect, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.999, f"regen/pass-sum agree on {close.mean():.4%}"


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne"])
def test_compiled_compact_matches_pass_sum(scene_name):
    """The Mosaic-compiled compacting wavefront equals the sum of single
    passes (interpret-mode proof in tests/test_megakernel.py)."""
    from pt_three_ways_tpu.models.integrator import trace_passes_compact

    scene, camera, params = build(scene_name, size=32)
    n = params.width * params.height
    px = jnp.asarray(np.arange(n, dtype=np.int32) % params.width)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // params.width)
    base = rng.base_key(params.seed)
    S = 2
    fused = np.asarray(
        trace_passes_compact(scene, camera, params, base, 0, 0, px, py, S)
    )
    expect = np.zeros((n, 3), np.float64)
    for s in range(S):
        key = jax.random.fold_in(jax.random.fold_in(base, s), 0)
        expect += np.asarray(
            trace_pass(scene, camera, params, key, px, py), np.float64
        )
    assert np.isfinite(fused).all()
    close = np.isclose(fused, expect, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.999, f"compact/pass-sum agree on {close.mean():.4%}"


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne", "ce"])
def test_compiled_megakernel_matches_wavefront(scene_name):
    scene, camera, params = build(scene_name)
    n = params.width * params.height
    px = jnp.asarray(np.arange(n, dtype=np.int32) % params.width)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // params.width)
    key = rng.pass_key(rng.base_key(params.seed), 0)
    fused = np.asarray(trace_pass(scene, camera, params, key, px, py))
    unfused = np.asarray(
        trace_pass(scene, camera, params.replace(fused="off"), key, px, py)
    )
    assert np.isfinite(fused).all()
    # same RNG streams; f32 rounding + rare winner flips only
    close = np.isclose(fused, unfused, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.999, f"fused/unfused agree on {close.mean():.4%}"
    assert abs(fused.mean() - unfused.mean()) < 1e-3


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne"])
def test_compiled_replay_gradients_match_xla_backward(scene_name):
    """The Mosaic-compiled path-replay pipeline (bounce_step with_hit
    forward + bounce_bwd_step backward) gates against the XLA jax.vjp
    replay backward at the same saved winners (tests/test_replay.py proves
    the parity in interpret mode; this compiles the real kernels)."""
    from pt_three_ways_tpu.models.replay import trace_pass_replay
    from pt_three_ways_tpu.ops import rng as _rng

    scene, camera, params = build(scene_name)
    n = params.width * params.height
    px = jnp.asarray(np.arange(n, dtype=np.int32) % params.width)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // params.width)
    key = _rng.pass_key(_rng.base_key(3), 0)
    w = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, 3)), jnp.float32
    )

    def loss(kb):
        def f(m):
            sc = scene._replace(materials=m)
            return jnp.sum(
                trace_pass_replay(sc, camera, params, key, px, py,
                                  kernel_bwd=kb) * w
            )
        return f

    v0, g0 = jax.value_and_grad(loss(False))(scene.materials)
    v1, g1 = jax.value_and_grad(loss(True))(scene.materials)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    # compiled-vs-compiled: the two backwards sum thousands of per-lane
    # contributions in different orders (VMEM grid accumulation vs XLA
    # reduce), measured <= 1.4e-3 relative on v5e; interpret mode proves
    # bit-level parity (tests/test_replay.py)
    for name in g0._fields:
        a, b = np.asarray(getattr(g0, name)), np.asarray(getattr(g1, name))
        assert np.isfinite(b).all(), name
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, rtol=3e-3, atol=3e-3 * scale, err_msg=name
        )


def test_cold_lowering_guard():
    """The full kernel battery must lower + compile FROM SOURCE with the
    persistent compilation cache disabled (tools/cold_lower.py). Guards
    against the round-3 failure mode where the committed .jax_cache served
    binaries for a kernel the current libtpu could no longer compile
    (scoped-VMEM over the 16 MiB limit). Compile success is the VMEM pin:
    Mosaic rejects over-limit kernels at compile time."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k != "JAX_COMPILATION_CACHE_DIR"}
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "cold_lower.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=repo,
    )
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert proc.returncode == 0, (
        f"cold lowering failed:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
    total = [l for l in lines if l.get("program") == "TOTAL"]
    assert total and total[0]["ok"] and total[0]["n"] >= 6
