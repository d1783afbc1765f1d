"""Path-replay differentiable fused path (models/replay.py): gradient
parity with the lax.scan wavefront, primal parity with the kernel chain,
and the training step running on the fused forward.

The scan path differentiates by tracing the whole forward; the replay path
runs the Pallas bounce_step chain forward (with_hit=True) and replays only
the shading tail (bounce_from_hits at the saved winners) in the backward.
Both differentiate the SAME estimator (src/dod/Scene.cpp:124-179), so
gradients must agree to f32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.replay import trace_pass_replay
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


def _setup(scene_name, side=10, seed=9, max_depth=4):
    p = RenderParams(
        width=side, height=side, samples_per_pixel=1, seed=seed,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=max_depth,
    )
    sb = SceneBuilder()
    cam = create_scene(sb, scene_name, p)
    scene = sb.build()
    n = side * side
    px = jnp.asarray(np.arange(n, dtype=np.int32) % side)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // side)
    key = rng.pass_key(rng.base_key(seed), 0)
    w = jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, 3)), jnp.float32
    )
    return p, scene, cam, px, py, key, w


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne"])
def test_replay_gradients_match_scan(scene_name):
    p, scene, cam, px, py, key, w = _setup(scene_name)
    p_scan = p.replace(intersector="xla", kill_dead_paths=True, fused="off")
    p_rep = p.replace(intersector="pallas-interpret")

    def loss(trace, pp):
        def f(m, c):
            sc = scene._replace(materials=m)
            return jnp.sum(trace(sc, c, pp, key, px, py) * w)
        return f

    v0, (gm0, gc0) = jax.value_and_grad(loss(trace_pass, p_scan), (0, 1))(
        scene.materials, cam
    )
    v1, (gm1, gc1) = jax.value_and_grad(
        loss(trace_pass_replay, p_rep), (0, 1)
    )(scene.materials, cam)

    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for name in gm0._fields:
        a = np.asarray(getattr(gm0, name))
        b = np.asarray(getattr(gm1, name))
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, rtol=1e-5, atol=1e-5 * scale, err_msg=f"materials.{name}"
        )
    for i, (a, b) in enumerate(
        zip(jax.tree.leaves(gc0), jax.tree.leaves(gc1))
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, rtol=1e-5, atol=1e-5 * scale, err_msg=f"camera leaf {i}"
        )


def test_replay_primal_matches_scan_kill_dead():
    """The forward (kernel chain) equals the scan wavefront with
    kill_dead=True to f32 rounding."""
    p, scene, cam, px, py, key, _ = _setup("cornell", side=12, seed=4)
    p_scan = p.replace(intersector="xla", kill_dead_paths=True, fused="off")
    p_rep = p.replace(intersector="pallas-interpret")
    a = np.asarray(trace_pass(scene, cam, p_scan, key, px, py))
    b = np.asarray(trace_pass_replay(scene, cam, p_rep, key, px, py))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_replay_env_gradient_flows():
    """scene.environment is a differentiable input of the replay chain
    (env light on every miss after the first bounce)."""
    p, scene, cam, px, py, key, w = _setup("suzanne", side=8, seed=2)
    p_rep = p.replace(intersector="pallas-interpret")

    def f(env):
        sc = scene._replace(environment=env)
        return jnp.sum(trace_pass_replay(sc, cam, p_rep, key, px, py) * w)

    g = jax.grad(f)(scene.environment)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0


def test_train_step_uses_replay_and_learns():
    """make_sharded_train_step(fused='auto') on the Pallas-interpret
    backend routes through the replay path, produces a finite loss and
    moves the materials."""
    from pt_three_ways_tpu.parallel.mesh import make_mesh
    from pt_three_ways_tpu.parallel.train import TrainState, make_sharded_train_step

    p = RenderParams(
        width=8, height=8, samples_per_pixel=1, seed=3,
        first_bounce_u_samples=2, first_bounce_v_samples=2, max_depth=3,
        intersector="pallas-interpret",
    )
    sb = SceneBuilder()
    cam = create_scene(sb, "cornell", p)
    scene = sb.build()
    mesh = make_mesh(n_devices=8, dp=2)
    step = make_sharded_train_step(scene, p, mesh, learning_rate=0.01)

    n = 64
    px = jnp.asarray(np.arange(n, dtype=np.int32) % 8)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // 8)
    target = jnp.zeros((n, 3), jnp.float32)
    key = rng.base_key(p.seed)
    state = TrainState(scene.materials, cam, jnp.int32(0))
    loss, new_state = step(state, key, px, py, target)
    assert np.isfinite(float(loss))
    moved = float(
        jnp.abs(new_state.materials.diffuse - scene.materials.diffuse).sum()
    )
    assert moved > 0.0


def test_kernel_backward_matches_xla_backward():
    """The fused Pallas backward (bounce_bwd_step: whole shading VJP in
    VMEM, table grads segment-summed to materials) must reproduce the XLA
    jax.vjp replay backward exactly (same math, same linearisation
    points)."""
    for scene_name in ("cornell", "suzanne"):
        p, scene, cam, px, py, key, w = _setup(scene_name, side=8, seed=6)
        p_rep = p.replace(intersector="pallas-interpret")

        def loss(kb):
            def f(m, c, e):
                sc = scene._replace(materials=m, environment=e)
                return jnp.sum(
                    trace_pass_replay(sc, c, p_rep, key, px, py,
                                      kernel_bwd=kb) * w
                )
            return f

        v0, g0 = jax.value_and_grad(loss(False), (0, 1, 2))(
            scene.materials, cam, scene.environment
        )
        v1, g1 = jax.value_and_grad(loss(True), (0, 1, 2))(
            scene.materials, cam, scene.environment
        )
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all()
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5 * scale)


# --- REGENERATING multi-pass replay (round 5) ---------------------------


def _setup_regen(scene_name, side=10, seed=9, max_depth=4, S=3):
    p = RenderParams(
        width=side, height=side, samples_per_pixel=S, seed=seed,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=max_depth, intersector="pallas-interpret",
        rng_mode="kernel",
    )
    sb = SceneBuilder()
    cam = create_scene(sb, scene_name, p)
    scene = sb.build()
    n = side * side
    px = jnp.asarray(np.arange(n, dtype=np.int32) % side)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // side)
    base = rng.base_key(seed)
    w = jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, 3)), jnp.float32
    )
    return p, scene, cam, px, py, base, w


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne"])
def test_regen_replay_primal_matches_production_forward(scene_name):
    """trace_passes_replay's primal is the production regen forward
    (trace_passes_fused, rng_mode=kernel) bit for bit — the residual
    emission must not perturb the estimator."""
    from pt_three_ways_tpu.models.integrator import trace_passes_fused
    from pt_three_ways_tpu.models.replay import trace_passes_replay

    S = 3
    p, scene, cam, px, py, base, _ = _setup_regen(scene_name, S=S)
    ref = trace_passes_fused(scene, cam, p, base, 0, 0, px, py, S)
    got = trace_passes_replay(scene, cam, p, base, 0, 0, px, py, S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne"])
def test_regen_replay_kernel_backward_matches_xla_backward(scene_name):
    """The Pallas reverse-walk backward (regen_replay_bwd) gates against
    the statically-unrolled XLA reference walk at the same residuals:
    materials, environment AND camera gradients."""
    from pt_three_ways_tpu.models.replay import trace_passes_replay

    S = 3
    p, scene, cam, px, py, base, w = _setup_regen(scene_name, S=S)

    def loss(kb):
        def f(m, c, e):
            sc = scene._replace(materials=m, environment=e)
            return jnp.sum(
                trace_passes_replay(sc, c, p, base, 0, 0, px, py, S,
                                    kernel_bwd=kb) * w)
        return f

    v0, g0 = jax.value_and_grad(loss(False), (0, 1, 2))(
        scene.materials, cam, scene.environment
    )
    v1, g1 = jax.value_and_grad(loss(True), (0, 1, 2))(
        scene.materials, cam, scene.environment
    )
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, rtol=5e-5, atol=5e-5 * scale)


def test_regen_replay_fused_equals_sum_of_singles():
    """Segment/reset oracle: the counter RNG draws depend only on
    (lane, sample, depth), so for a linear loss the fused S-sample
    gradient equals the sum of S independent single-sample gradients —
    any error in the reverse walk's segment-boundary resets breaks this."""
    from pt_three_ways_tpu.models.replay import trace_passes_replay

    S = 3
    p, scene, cam, px, py, base, w = _setup_regen("cornell", S=S)

    def loss_fused(m):
        sc = scene._replace(materials=m)
        return jnp.sum(
            trace_passes_replay(sc, cam, p, base, 0, 0, px, py, S) * w)

    def loss_single(s0):
        def f(m):
            sc = scene._replace(materials=m)
            return jnp.sum(
                trace_passes_replay(sc, cam, p, base, s0, 0, px, py, 1) * w)
        return f

    g_fused = jax.grad(loss_fused)(scene.materials)
    g_sum = jax.tree.map(
        lambda *xs: sum(xs),
        *[jax.grad(loss_single(s0))(scene.materials) for s0 in range(S)],
    )
    for name in g_fused._fields:
        a = np.asarray(getattr(g_sum, name))
        b = np.asarray(getattr(g_fused, name))
        scale = max(np.abs(a).max(), 1e-4)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5 * scale,
                                   err_msg=name)


def test_regen_replay_emission_fd():
    """Emission enters the estimator linearly, so central FD at fixed RNG
    is exact to f32 noise — an absolute ground-truth anchor for the
    regenerating chain's backward."""
    from pt_three_ways_tpu.models.replay import trace_passes_replay

    S = 3
    p, scene, cam, px, py, base, w = _setup_regen("cornell", S=S)
    m0 = scene.materials

    def loss_m(m):
        sc = scene._replace(materials=m)
        return jnp.sum(
            trace_passes_replay(sc, cam, p, base, 0, 0, px, py, S) * w)

    g = jax.grad(loss_m)(m0)
    gen = np.random.default_rng(1)
    for _ in range(2):
        de = jnp.asarray(gen.normal(size=m0.emission.shape), jnp.float32)
        de = de * 1e-2
        lp = loss_m(m0._replace(emission=m0.emission + de))
        lm = loss_m(m0._replace(emission=m0.emission - de))
        fd = (float(lp) - float(lm)) / 2.0
        ad = float(jnp.sum(g.emission * de))
        assert abs(fd - ad) < 2e-3 * max(abs(fd), 1.0), (fd, ad)


def test_train_step_regen_replay_passes_per_step():
    """make_sharded_train_step(passes_per_step=3) routes through the
    REGENERATING replay chain on the virtual mesh: finite decreasing-ish
    loss, materials move, and the run is deterministic."""
    from pt_three_ways_tpu.parallel.mesh import make_mesh
    from pt_three_ways_tpu.parallel.train import (
        TrainState,
        make_sharded_train_step,
    )

    p = RenderParams(
        width=8, height=8, samples_per_pixel=1, seed=3,
        first_bounce_u_samples=2, first_bounce_v_samples=2, max_depth=3,
        intersector="pallas-interpret",
    )
    sb = SceneBuilder()
    cam = create_scene(sb, "cornell", p)
    scene = sb.build()
    mesh = make_mesh(n_devices=8, dp=2)
    step = make_sharded_train_step(
        scene, p, mesh, learning_rate=0.01, passes_per_step=3
    )

    n = 64
    px = jnp.asarray(np.arange(n, dtype=np.int32) % 8)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // 8)
    target = jnp.zeros((n, 3), jnp.float32)
    key = rng.base_key(p.seed)
    state = TrainState(scene.materials, cam, jnp.int32(0))
    loss1, st1 = step(state, key, px, py, target)
    loss2, st2 = step(state, key, px, py, target)
    assert np.isfinite(float(loss1))
    np.testing.assert_array_equal(float(loss1), float(loss2))
    np.testing.assert_array_equal(
        np.asarray(st1.materials.diffuse), np.asarray(st2.materials.diffuse)
    )
    moved = float(
        jnp.abs(st1.materials.diffuse - scene.materials.diffuse).sum()
    )
    assert moved > 0.0
