"""Differentiability tests: finite-difference checks on pixel gradients
w.r.t. material albedo/emission and camera parameters (the north-star
gradient contract, BASELINE.md). Run in f64 for tight FD tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.materials import MaterialSpec
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.ops.camera import make_camera
from pt_three_ways_tpu.utils.render_params import RenderParams

DTYPE = jnp.float64


def build():
    sb = SceneBuilder()
    sb.add_sphere((0, 0, 5), 1.5, MaterialSpec.make_diffuse((0.6, 0.4, 0.3)))
    sb.add_sphere((2.5, 2.5, 3), 1.0, MaterialSpec.make_light((4, 4, 4)))
    sb.add_triangle((-8, -3, 9), (8, -3, 9), (0, -3, -9),
                    MaterialSpec.make_diffuse((0.5, 0.5, 0.5)))
    sb.set_environment_colour((0.1, 0.12, 0.15))
    scene = sb.build(DTYPE)
    params = RenderParams(
        width=8, height=8, first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=5,
    )
    camera = make_camera((0, 0, 0), (0, 0, 5), (0, 1, 0), 8, 8, 60.0, DTYPE)
    xs = jnp.asarray(np.arange(64, dtype=np.int32) % 8)
    ys = jnp.asarray(np.arange(64, dtype=np.int32) // 8)
    key = rng.pass_key(rng.base_key(params.seed), 0)
    return scene, camera, params, key, xs, ys


def image_sum(scene, camera, params, key, xs, ys):
    return jnp.sum(trace_pass(scene, camera, params, key, xs, ys))


class TestMaterialGradients:
    @pytest.mark.parametrize("field", ["diffuse", "emission"])
    def test_finite_difference(self, field):
        scene, camera, params, key, xs, ys = build()

        def loss(mats):
            return image_sum(scene._replace(materials=mats), camera, params, key, xs, ys)

        g = jax.grad(loss)(scene.materials)
        g_field = np.asarray(getattr(g, field))
        assert np.isfinite(g_field).all()
        assert np.abs(g_field).sum() > 0

        # central finite differences on a few entries
        h = 1e-5
        arr = np.asarray(getattr(scene.materials, field))
        checked = 0
        for idx in np.ndindex(arr.shape):
            if abs(g_field[idx]) < 1e-6:
                continue
            for sgn, store in ((1, "plus"), (-1, "minus")):
                pert = arr.copy()
                pert[idx] += sgn * h
                mats = scene.materials._replace(**{field: jnp.asarray(pert, DTYPE)})
                val = float(loss(mats))
                if sgn == 1:
                    lp = val
                else:
                    lm = val
            fd = (lp - lm) / (2 * h)
            assert fd == pytest.approx(float(g_field[idx]), rel=2e-3, abs=1e-6)
            checked += 1
            if checked >= 3:
                break
        assert checked >= 1

    def test_remat_matches_exact_gradient(self):
        scene, camera, params, key, xs, ys = build()

        def loss(mats, p):
            return image_sum(scene._replace(materials=mats), camera, p, key, xs, ys)

        g1 = jax.grad(loss)(scene.materials, params)
        g2 = jax.grad(loss)(scene.materials, params.replace(remat=True))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


class TestCameraGradients:
    def test_eye_position_gradient_via_fresnel(self):
        # At fixed RNG this estimator's realisations are piecewise constant
        # in the camera (contributions are products of material constants;
        # geometry only selects WHICH constants). The expected image still
        # depends smoothly on the camera through the Fresnel event
        # probability, which the likelihood-ratio branch weight
        # (integrator.branch_weight) exposes to AD. So: AD gradient must be
        # finite and nonzero, while fixed-RNG FD is (correctly) ~zero.
        scene, camera, params, key, xs, ys = build()

        def loss(centre):
            cam = camera._replace(centre=centre)
            return image_sum(scene, cam, params, key, xs, ys)

        g = np.asarray(jax.grad(loss)(camera.centre))
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0


class TestLikelihoodRatioGradient:
    def test_reflectivity_gradient_matches_statistical_fd(self):
        # The fixed-reflectivity event probability is differentiable only in
        # expectation (decisions flip discretely). Check the AD gradient
        # (with LR weights) against finite differences of the MEAN over many
        # correlated sample passes. Deterministic given the fixed seeds.
        sb = SceneBuilder()
        mat = MaterialSpec.make_reflective((0.2, 0.2, 0.2), 0.4, 10.0)
        sb.add_sphere((0, 0, 4), 1.5, mat)
        sb.add_sphere((4, 4, -2), 3.0, MaterialSpec.make_light((6, 6, 6)))
        sb.set_environment_colour((0.02, 0.02, 0.02))
        scene = sb.build(DTYPE)
        params = RenderParams(
            width=6, height=6, first_bounce_u_samples=1,
            first_bounce_v_samples=1, max_depth=3, seed=17,
        )
        camera = make_camera((0, 0, 0), (0, 0, 4), (0, 1, 0), 6, 6, 50.0, DTYPE)
        xs = jnp.asarray(np.arange(36, dtype=np.int32) % 6)
        ys = jnp.asarray(np.arange(36, dtype=np.int32) // 6)
        base = rng.base_key(params.seed)
        n_passes = 192

        def mean_loss(refl_value):
            mats = scene.materials._replace(
                reflectivity=jnp.where(
                    scene.materials.reflectivity >= 0,
                    refl_value,
                    scene.materials.reflectivity,
                )
            )
            sc = scene._replace(materials=mats)

            def one(i):
                return image_sum(sc, camera, params, rng.pass_key(base, i), xs, ys)

            vals = jax.lax.map(one, jnp.arange(n_passes))
            return jnp.mean(vals)

        r0 = jnp.asarray(0.4, DTYPE)
        g = float(jax.grad(mean_loss)(r0))
        h = 0.1
        fd = (float(mean_loss(r0 + h)) - float(mean_loss(r0 - h))) / (2 * h)
        assert np.isfinite(g)
        assert g == pytest.approx(fd, rel=0.35)
