"""Fused Pallas intersection kernel vs the XLA reference intersector.

Runs in Pallas interpreter mode on CPU; on TPU the same code path compiles
to a Mosaic kernel. Asserts exact winner agreement on random scenes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.models.materials import MaterialSpec
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import pallas_intersect as pk
from pt_three_ways_tpu.ops.intersect import intersect_spheres, intersect_triangles

EPS = 1e-4


def random_scene(rng_np, n_tri=37, n_sph=5):
    sb = SceneBuilder()
    mat = MaterialSpec.make_diffuse((1, 1, 1))
    for _ in range(n_tri):
        base = rng_np.uniform(-4, 4, size=3)
        sb.add_triangle(base, base + rng_np.normal(size=3),
                        base + rng_np.normal(size=3), mat)
    for _ in range(n_sph):
        sb.add_sphere(rng_np.uniform(-4, 4, size=3),
                      abs(rng_np.normal()) + 0.3, mat)
    return sb.build()


def random_rays(rng_np, n):
    org = rng_np.uniform(-6, 6, size=(3, n))
    d = rng_np.normal(size=(3, n))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32)


def reference_best(scene, org, dirn):
    t_t, i_t = intersect_triangles(org, dirn, scene.triangles.woop, EPS)
    t_s, i_s = intersect_spheres(
        org, dirn, scene.spheres.centre, scene.spheres.radius_sq,
        scene.spheres.centre_sq, EPS,
    )
    tri_wins = t_t < t_s
    t = jnp.where(tri_wins, t_t, t_s)
    n_tri = scene.triangles.woop.shape[0]
    idx = jnp.where(tri_wins, i_t, i_s + n_tri)
    return np.asarray(t), np.asarray(idx), np.asarray(t_s), np.asarray(t_t)


@pytest.mark.parametrize("n_tri,n_sph", [(37, 5), (5, 1), (130, 70), (0, 7), (37, 0)])
def test_kernel_matches_reference(rng_np, n_tri, n_sph):
    scene = random_scene(rng_np, n_tri, n_sph)
    org, dirn = random_rays(rng_np, pk.RT)
    packed = pk.PackedScene(scene)
    t, idx = pk.intersect_packed(packed, org, dirn, EPS, interpret=True)
    rt, ridx, _, _ = reference_best(scene, org, dirn)
    t = np.asarray(t)
    idx = np.asarray(idx)
    hit = np.isfinite(rt)
    np.testing.assert_array_equal(np.isfinite(t), hit)
    # kernel FMA order differs from the XLA matmul path -> tiny f32 drift;
    # near-ties may flip the winner index on a handful of lanes
    np.testing.assert_allclose(t[hit], rt[hit], rtol=2e-4)
    assert (idx[hit] != ridx[hit]).mean() < 0.01


def test_kernel_live_mask(rng_np):
    """Dead lanes report a miss; live lanes are unaffected by the mask.
    Covers partially-dead tiles and a fully-dead tile (whole-tile skip)."""
    scene = random_scene(rng_np, 130, 5)
    org, dirn = random_rays(rng_np, 2 * pk.RT)
    packed = pk.PackedScene(scene)
    live = jnp.asarray(
        np.concatenate([
            rng_np.random(pk.RT) < 0.5,     # mixed tile
            np.zeros(pk.RT, bool),          # fully dead tile
        ])
    )
    t_all, i_all = pk.intersect_packed(packed, org, dirn, EPS, interpret=True)
    t_m, i_m = pk.intersect_packed(
        packed, org, dirn, EPS, interpret=True, live=live
    )
    live_np = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(t_m)[live_np],
                                  np.asarray(t_all)[live_np])
    np.testing.assert_array_equal(np.asarray(i_m)[live_np],
                                  np.asarray(i_all)[live_np])
    assert np.isposinf(np.asarray(t_m)[~live_np]).all()


def test_kernel_multi_tile(rng_np):
    scene = random_scene(rng_np, 20, 3)
    org, dirn = random_rays(rng_np, 2 * pk.RT)
    packed = pk.PackedScene(scene)
    t, idx = pk.intersect_packed(packed, org, dirn, EPS, interpret=True)
    rt, ridx, _, _ = reference_best(scene, org, dirn)
    hit = np.isfinite(rt)
    np.testing.assert_allclose(np.asarray(t)[hit], rt[hit], rtol=2e-4)
    assert (np.asarray(idx)[hit] != ridx[hit]).mean() < 0.01


def test_trace_pass_with_pallas_backend(rng_np):
    """Full wavefront pass via the kernel path == XLA path (same RNG)."""
    import jax.numpy as jnp
    from pt_three_ways_tpu.models.integrator import trace_pass
    from pt_three_ways_tpu.ops import rng as prng
    from pt_three_ways_tpu.ops.camera import make_camera
    from pt_three_ways_tpu.utils.render_params import RenderParams

    scene = random_scene(rng_np, 10, 4)
    params = RenderParams(
        width=16, height=16, first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=3,
    )
    camera = make_camera((0, 0, -8), (0, 0, 0), (0, 1, 0), 16, 16, 60.0)
    xs = jnp.asarray(np.arange(256, dtype=np.int32) % 16)
    ys = jnp.asarray(np.arange(256, dtype=np.int32) // 16)
    key = prng.pass_key(prng.base_key(3), 0)
    a = np.asarray(trace_pass(scene, camera, params, key, xs, ys))
    b = np.asarray(
        trace_pass(
            scene, camera,
            params.replace(intersector="pallas-interpret"), key, xs, ys,
        )
    )
    # identical estimator + RNG; only f32 rounding of t differs, which can
    # flip rare near-tie winners -> compare means and allow tiny pointwise drift
    assert np.isfinite(b).all()
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.98
    assert abs(a.mean() - b.mean()) < 0.01


def test_cluster_culling_is_exact(rng_np):
    """cull=True must give identical winners to cull=False (conservative)."""
    # clustered geometry so Morton ordering + chunk AABBs are meaningful
    sb = SceneBuilder()
    mat = MaterialSpec.make_diffuse((1, 1, 1))
    for c in range(12):
        centre = rng_np.uniform(-20, 20, size=3)
        for _ in range(30):
            base = centre + rng_np.normal(size=3)
            sb.add_triangle(base, base + rng_np.normal(size=3) * 0.5,
                            base + rng_np.normal(size=3) * 0.5, mat)
    scene = sb.build()  # Morton-reorders (> 64 tris)
    assert scene.num_triangles == 360
    org, dirn = random_rays(rng_np, pk.RT)
    packed = pk.PackedScene(scene)
    assert packed.n_tri > 4 * pk.TC  # culling active
    t1, i1 = pk.intersect_packed(packed, org, dirn, EPS, interpret=True, cull=True)
    t2, i2 = pk.intersect_packed(packed, org, dirn, EPS, interpret=True, cull=False)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_gradients_match_xla_backend(rng_np):
    """The kernel's custom VJP (analytic dt) must agree with XLA autodiff."""
    import jax
    import jax.numpy as jnp
    from pt_three_ways_tpu.models.integrator import trace_pass
    from pt_three_ways_tpu.ops import rng as prng
    from pt_three_ways_tpu.ops.camera import make_camera
    from pt_three_ways_tpu.utils.render_params import RenderParams

    scene = random_scene(rng_np, 8, 3)
    params = RenderParams(
        width=8, height=8, first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=3, seed=13,
    )
    camera = make_camera((0, 0, -8), (0, 0, 0), (0, 1, 0), 8, 8, 60.0)
    xs = jnp.asarray(np.arange(64, dtype=np.int32) % 8)
    ys = jnp.asarray(np.arange(64, dtype=np.int32) // 8)
    key = prng.pass_key(prng.base_key(13), 0)

    def loss(mats, centre, p):
        sc = scene._replace(materials=mats)
        cam = camera._replace(centre=centre)
        return jnp.sum(trace_pass(sc, cam, p, key, xs, ys))

    # fused="off": differentiation uses the lax.scan wavefront whose Pallas
    # intersector has the custom VJP (the fused megakernel is forward-only;
    # parallel/train.py sets the same flag)
    g_x = jax.grad(loss, argnums=(0, 1))(
        scene.materials, camera.centre, params.replace(intersector="xla")
    )
    g_p = jax.grad(loss, argnums=(0, 1))(
        scene.materials, camera.centre,
        params.replace(intersector="pallas-interpret", fused="off"),
    )
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)
