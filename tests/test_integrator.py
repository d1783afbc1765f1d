"""Estimator correctness: analytic furnace-style tests + cross-way agreement.

These are the statistical tests the reference lacks (SURVEY.md section 4,
"what's missing"), plus its determinism contract (test/seed_tests.sh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.materials import MaterialSpec
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.models.ways import WAYS
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.ops.camera import make_camera
from pt_three_ways_tpu.utils.render_params import RenderParams


def small_params(**kw):
    defaults = dict(
        width=16,
        height=16,
        samples_per_pixel=1,
        max_depth=5,
        first_bounce_u_samples=2,
        first_bounce_v_samples=2,
        seed=42,
    )
    defaults.update(kw)
    return RenderParams(**defaults)


def pixel_grid(params):
    xs = jnp.asarray(np.tile(np.arange(params.width, dtype=np.int32), params.height))
    ys = jnp.asarray(
        np.repeat(np.arange(params.height, dtype=np.int32), params.width)
    )
    return xs, ys


def run_pass(scene, camera, params, seed=1, way="dod"):
    xs, ys = pixel_grid(params)
    key = rng.pass_key(rng.base_key(params.seed), seed)
    return np.asarray(WAYS[way](scene, camera, params, key, xs, ys))


class TestAnalytic:
    def test_environment_only(self):
        sb = SceneBuilder()
        sb.set_environment_colour((0.25, 0.5, 0.75))
        scene = sb.build()
        params = small_params()
        camera = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 16, 16, 60.0)
        img = run_pass(scene, camera, params)
        np.testing.assert_allclose(img, np.tile([0.25, 0.5, 0.75], (256, 1)), atol=1e-6)

    def test_emitter_direct_view(self):
        # Camera inside a pure emitter: radiance == emission exactly.
        sb = SceneBuilder()
        sb.add_sphere((0, 0, 0), 5.0, MaterialSpec.make_light((2.0, 3.0, 4.0)))
        scene = sb.build()
        params = small_params()
        camera = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 16, 16, 60.0)
        img = run_pass(scene, camera, params)
        np.testing.assert_allclose(img, np.tile([2, 3, 4], (256, 1)), atol=1e-5)

    def test_diffuse_furnace_geometric_series(self):
        # Camera inside an emissive diffuse sphere with ior=1 (=> Fresnel
        # reflectivity 0, always the diffuse branch): with E per bounce and
        # albedo rho, truncation at max_depth gives
        #   L = E * sum_{k=0}^{max_depth-1} rho^k.
        rho = 0.6
        emit = 0.3
        sb = SceneBuilder()
        sb.add_sphere(
            (0, 0, 0),
            5.0,
            MaterialSpec(
                emission=(emit,) * 3,
                diffuse=(rho,) * 3,
                index_of_refraction=1.0,
            ),
        )
        scene = sb.build()
        params = small_params(max_depth=5, width=32, height=32)
        camera = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 32, 32, 60.0)
        imgs = [run_pass(scene, camera, params, seed=s) for s in range(8)]
        mean = np.mean(imgs)
        expected = emit * sum(rho**k for k in range(5))
        assert mean == pytest.approx(expected, rel=0.02)

    def test_preview_returns_diffuse(self):
        sb = SceneBuilder()
        sb.add_sphere((0, 0, 5), 1.0, MaterialSpec.make_diffuse((0.1, 0.2, 0.9)))
        sb.set_environment_colour((1, 0, 0))
        scene = sb.build()
        params = small_params(preview=True)
        camera = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 16, 16, 30.0)
        img = run_pass(scene, camera, params).reshape(16, 16, 3)
        np.testing.assert_allclose(img[8, 8], [0.1, 0.2, 0.9], atol=1e-6)
        np.testing.assert_allclose(img[0, 0], [1, 0, 0], atol=1e-6)

    def test_depth_cutoff_darkens(self):
        # deeper allowed depth must never reduce energy
        sb = SceneBuilder()
        sb.add_sphere(
            (0, 0, 0),
            5.0,
            MaterialSpec(
                emission=(0.2,) * 3, diffuse=(0.9,) * 3, index_of_refraction=1.0
            ),
        )
        scene = sb.build()
        camera = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 16, 16, 60.0)
        shallow = run_pass(scene, camera, small_params(max_depth=2)).mean()
        deep = run_pass(scene, camera, small_params(max_depth=6)).mean()
        assert deep > shallow


class TestWaysAgree:
    @pytest.mark.parametrize("way", ["oo", "fp"])
    def test_matches_wavefront_bitstream(self, way):
        sb = SceneBuilder()
        sb.add_sphere((0, 1, 5), 1.0, MaterialSpec.make_diffuse((0.7, 0.3, 0.2)))
        sb.add_sphere((0, -2, 5), 1.5, MaterialSpec.make_reflective((0.9,) * 3, 0.8, 5))
        sb.add_sphere((3, 3, 3), 1.0, MaterialSpec.make_light((5, 5, 5)))
        sb.add_triangle((-9, -4, 9), (9, -4, 9), (0, -4, -9),
                        MaterialSpec.make_specular((0.5, 0.5, 0.8), 1.3))
        sb.set_environment_colour((0.05, 0.05, 0.1))
        scene = sb.build()
        params = small_params()
        camera = make_camera((0, 0, -2), (0, 0, 5), (0, 1, 0), 16, 16, 60.0)
        ref = run_pass(scene, camera, params, way="dod")
        got = run_pass(scene, camera, params, way=way)
        # identical RNG streams -> equal up to reduction order
        np.testing.assert_allclose(got, ref, atol=2e-5)


class TestDeterminism:
    def _scene(self):
        sb = SceneBuilder()
        sb.add_sphere((0, 0, 5), 1.0, MaterialSpec.make_diffuse((0.7, 0.3, 0.2)))
        sb.add_sphere((3, 3, 3), 1.0, MaterialSpec.make_light((5, 5, 5)))
        sb.set_environment_colour((0.1, 0.1, 0.1))
        return sb.build()

    def test_same_seed_bit_identical(self):
        # the analogue of test/seed_tests.sh:12-34
        scene = self._scene()
        params = small_params(seed=7)
        camera = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 16, 16, 60.0)
        a = run_pass(scene, camera, params)
        b = run_pass(scene, camera, params)
        np.testing.assert_array_equal(a, b)

    def test_different_seed_differs(self):
        scene = self._scene()
        camera = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 16, 16, 60.0)
        a = run_pass(scene, camera, small_params(seed=7))
        b = run_pass(scene, camera, small_params(seed=8))
        assert not np.array_equal(a, b)
