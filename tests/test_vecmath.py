"""Math-layer tests (reference: test/math/*Tests.cpp).

Vectors are component-major: a single vector is shape (3,), a batch is
(3, N).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.ops import vecmath as vm

APPROX = 1e-4  # matches ApproxVec3 epsilon (src/math/ApproxVec3.h:9)


def v(*xs):
    return jnp.asarray(np.array(xs, np.float32))


class TestBasics:
    def test_dot_cross_length(self):
        a = v(1.0, 2.0, 3.0)
        b = v(4.0, 5.0, 6.0)
        assert float(vm.dot(a, b)) == pytest.approx(32.0)
        np.testing.assert_allclose(vm.cross(a, b), [-3.0, 6.0, -3.0], atol=APPROX)
        assert float(vm.length(v(3.0, 4.0, 0.0))) == pytest.approx(5.0)

    def test_normalise(self):
        n = vm.normalise(v(10.0, 0.0, 0.0))
        np.testing.assert_allclose(n, [1, 0, 0], atol=APPROX)
        z = vm.normalise(v(0.0, 0.0, 0.0))
        assert np.isfinite(np.asarray(z)).all()

    def test_batched(self):
        a = jnp.ones((3, 8))
        assert vm.dot(a, a).shape == (8,)
        assert vm.cross(a, a).shape == (3, 8)

    def test_cross_matches_numpy(self, rng_np):
        a = rng_np.normal(size=(3, 17))
        b = rng_np.normal(size=(3, 17))
        ours = np.asarray(vm.cross(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
        ref = np.cross(a.T, b.T).T
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestReflect:
    def test_reflection_identities(self):
        n = v(0.0, 1.0, 0.0)
        incoming = vm.normalise(v(1.0, -1.0, 0.0))
        r = vm.reflect(incoming, n)
        expected = vm.normalise(v(1.0, 1.0, 0.0))
        np.testing.assert_allclose(r, expected, atol=APPROX)

    def test_normal_incidence(self):
        n = v(0.0, 0.0, 1.0)
        incoming = v(0.0, 0.0, -1.0)
        np.testing.assert_allclose(vm.reflect(incoming, n), [0, 0, 1], atol=APPROX)


class TestReflectance:
    def test_normal_incidence_fresnel(self):
        # R0 = ((n1-n2)/(n1+n2))^2 at normal incidence
        n = v(0.0, 0.0, 1.0)
        incoming = v(0.0, 0.0, -1.0)
        r = float(vm.reflectance(n, incoming, jnp.float32(1.0), jnp.float32(1.5)))
        assert r == pytest.approx(((1 - 1.5) / (1 + 1.5)) ** 2, abs=1e-5)

    def test_total_internal_reflection(self):
        n = v(0.0, 0.0, 1.0)
        incoming = vm.normalise(v(1.0, 0.0, -0.1))
        r = float(vm.reflectance(n, incoming, jnp.float32(1.5), jnp.float32(1.0)))
        assert r == 1.0

    def test_range(self, rng_np):
        dirs = rng_np.normal(size=(3, 100))
        dirs[2] = -np.abs(dirs[2]) - 0.01
        dirs = dirs / np.linalg.norm(dirs, axis=0, keepdims=True)
        n = jnp.broadcast_to(v(0.0, 0.0, 1.0)[:, None], (3, 100))
        r = vm.reflectance(
            n, jnp.asarray(dirs, jnp.float32), jnp.float32(1.0), jnp.float32(1.3)
        )
        r = np.asarray(r)
        assert (r >= 0).all() and (r <= 1).all()


class TestOnb:
    @pytest.mark.parametrize(
        "axis",
        [
            (1, 0, 0), (0, 1, 0), (0, 0, 1),
            (-1, 0, 0), (0, -1, 0), (0, 0, -1),
        ],
    )
    def test_from_z_degenerate_axes(self, axis):
        # OrthoNormalBasisTests.cpp:33-51: orthogonality for coincident axes
        basis = vm.onb_from_z(v(*axis))
        for a, b in [(basis.x, basis.y), (basis.y, basis.z), (basis.x, basis.z)]:
            assert abs(float(vm.dot(a, b))) < APPROX
        for a in basis:
            assert float(vm.length(a)) == pytest.approx(1.0, abs=APPROX)

    def test_from_z_random(self, rng_np):
        dirs = rng_np.normal(size=(3, 50))
        dirs = dirs / np.linalg.norm(dirs, axis=0, keepdims=True)
        basis = vm.onb_from_z(jnp.asarray(dirs, jnp.float32))
        np.testing.assert_allclose(vm.dot(basis.x, basis.y), 0, atol=APPROX)
        np.testing.assert_allclose(vm.dot(basis.x, basis.z), 0, atol=APPROX)
        np.testing.assert_allclose(vm.dot(basis.y, basis.z), 0, atol=APPROX)

    def test_transform(self):
        basis = vm.onb_from_z(v(0.0, 0.0, 1.0))
        out = basis.transform(v(0.0, 0.0, 1.0))
        np.testing.assert_allclose(out, [0, 0, 1], atol=APPROX)


class TestSamples:
    def test_cone_sample_mirror(self):
        # coneTheta < Epsilon returns the direction unchanged (Samples.cpp:7-8)
        d = vm.normalise(v(1.0, 2.0, 3.0))
        out = vm.cone_sample(d, jnp.float32(0.0), jnp.float32(0.3), jnp.float32(0.7))
        np.testing.assert_allclose(out, d, atol=1e-6)

    def test_cone_sample_within_cone(self, rng_np):
        d = jnp.broadcast_to(v(0.0, 0.0, 1.0)[:, None], (3, 200))
        theta = 0.3
        us = jnp.asarray(rng_np.uniform(size=200), jnp.float32)
        vs = jnp.asarray(rng_np.uniform(size=200), jnp.float32)
        out = vm.cone_sample(d, jnp.full((200,), theta, jnp.float32), us, vs)
        cos_angle = np.asarray(vm.dot(out, d))
        assert (cos_angle >= math.cos(theta) - 1e-4).all()
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=0), 1.0, atol=APPROX
        )

    def test_hemisphere_sample_is_cosine_weighted(self, rng_np):
        n = 20000
        basis1 = vm.onb_from_z(v(0.0, 0.0, 1.0))
        basis = vm.Onb(
            jnp.broadcast_to(basis1.x[:, None], (3, n)),
            jnp.broadcast_to(basis1.y[:, None], (3, n)),
            jnp.broadcast_to(basis1.z[:, None], (3, n)),
        )
        us = jnp.asarray(rng_np.uniform(size=n), jnp.float32)
        vs = jnp.asarray(rng_np.uniform(size=n), jnp.float32)
        out = np.asarray(vm.hemisphere_sample(basis, us, vs))
        assert (out[2] >= -1e-6).all()  # upper hemisphere
        # For cosine-weighted sampling E[cos theta] = 2/3
        assert out[2].mean() == pytest.approx(2.0 / 3.0, abs=0.01)
        np.testing.assert_allclose(np.linalg.norm(out, axis=0), 1.0, atol=APPROX)


def test_reflectance_gradient_finite_at_grazing_tir_boundary():
    """Round-5 hardware find: an f32-exact grazing hit (cos_i == 0) at the
    TIR boundary (sin_t_sq == 1, cos_t == 0) made r_perp 0/0; the NaN was
    value-masked in practical configs but its PARTIALS leaked through zero
    cotangents (NaN * 0 == NaN), poisoning material gradients about once
    per few million lanes. The denominator guard must keep both the value
    and every partial finite at the exact degenerate point."""
    import jax

    normal = vm.vec3(
        jnp.zeros((2,)), jnp.zeros((2,)), jnp.ones((2,))
    )
    # lane 0: exactly grazing (cos_i == 0); lane 1: ordinary
    incoming = vm.vec3(
        jnp.asarray([1.0, 0.6]), jnp.zeros((2,)),
        jnp.asarray([0.0, -0.8]),
    )
    ior = jnp.asarray([1.0, 1.5])

    def f(inc, ior_v):
        r = vm.reflectance(
            normal, inc, jnp.ones_like(ior_v), ior_v
        )
        # zero weight on the degenerate lane: exactly the masked-out
        # pattern that used to leak NaN partials
        return jnp.sum(r * jnp.asarray([0.0, 1.0]))

    val, (g_inc, g_ior) = jax.value_and_grad(f, (0, 1))(incoming, ior)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g_inc)).all()
    assert np.isfinite(np.asarray(g_ior)).all()
