"""End-to-end differentiable rendering: recover a known material albedo by
gradient descent on rendered pixels — the concrete form of the north-star
"pixel gradients w.r.t. material albedo/emission" contract."""

import jax
import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.materials import MaterialSpec
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.ops.camera import make_camera
from pt_three_ways_tpu.utils.render_params import RenderParams


def build(albedo):
    sb = SceneBuilder()
    sb.add_sphere((0, 0, 4), 1.5, MaterialSpec.make_diffuse(albedo))
    sb.add_sphere((3, 3, 0), 2.0, MaterialSpec.make_light((6, 6, 6)))
    sb.set_environment_colour((0.05, 0.05, 0.05))
    scene = sb.build()
    params = RenderParams(
        width=16, height=16, first_bounce_u_samples=2,
        first_bounce_v_samples=2, max_depth=3, seed=21, remat=True,
    )
    camera = make_camera((0, 0, 0), (0, 0, 4), (0, 1, 0), 16, 16, 55.0)
    xs = jnp.asarray(np.arange(256, dtype=np.int32) % 16)
    ys = jnp.asarray(np.arange(256, dtype=np.int32) // 16)
    return scene, camera, params, xs, ys


def test_recovers_albedo():
    # Matched-RNG objective (same key for target and optimisation renders):
    # with fixed decisions the rendered image is an analytic function of the
    # material table, and gradient descent recovers the albedo EXACTLY.
    # (MSE against independently-sampled noisy targets is biased toward dark
    # albedos — it minimises estimator variance too; a classic
    # inverse-rendering pitfall, avoided by path-replay with shared RNG.)
    true_albedo = (0.7, 0.25, 0.45)
    scene_true, camera, params, xs, ys = build(true_albedo)
    key = rng.base_key(77)
    target = trace_pass(scene_true, camera, params, key, xs, ys)

    scene_init, *_ = build((0.3, 0.6, 0.2))  # wrong initial albedo
    mat_idx = 0  # the diffuse sphere's material id (first interned)

    def loss_fn(mats):
        sc = scene_init._replace(materials=mats)
        img = trace_pass(sc, camera, params, key, xs, ys)
        return jnp.mean((img - target) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    mats = scene_init.materials
    l0 = None
    for i in range(40):
        l, g = step(mats)
        mats = mats._replace(diffuse=mats.diffuse - 3.0 * g.diffuse)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0 * 1e-6
    recovered = np.asarray(mats.diffuse[mat_idx])
    np.testing.assert_allclose(recovered, true_albedo, atol=1e-3)


def test_recovers_emission():
    scene_true, camera, params, xs, ys = build((0.5, 0.5, 0.5))
    key = rng.base_key(88)
    target = trace_pass(scene_true, camera, params, key, xs, ys)

    # wrong light brightness
    dimmed = scene_true.materials._replace(
        emission=scene_true.materials.emission * 0.4
    )

    def loss_fn(mats, k):
        sc = scene_true._replace(materials=mats)
        img = trace_pass(sc, camera, params, k, xs, ys)
        return jnp.mean((img - target) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    mats = dimmed
    l0 = None
    # optimise only the light's emission row (the sphere-emission direction
    # has far higher curvature, so a shared large lr would diverge); the
    # light covers few pixels -> tiny curvature -> large lr is stable
    light_id = 1
    row = (jnp.arange(mats.emission.shape[0]) == light_id)[:, None]
    for i in range(120):
        l, g = step(mats, key)  # same key as target: exact-match objective
        mats = mats._replace(emission=mats.emission - 200.0 * g.emission * row)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0 * 1e-3
    np.testing.assert_allclose(
        np.asarray(mats.emission[light_id]),
        np.asarray(scene_true.materials.emission[light_id]),
        rtol=0.1,
    )
