"""Intersection tests: the reference's triplicated golden values
(test/{oo,fp,dod}/SphereTests.cpp, TriangleTests.cpp, dod/SceneTests.cpp)
asserted once against the single TPU intersector."""

import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.models.materials import MaterialSpec
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops.intersect import (
    intersect_scene,
    intersect_spheres,
    intersect_triangles,
)

APPROX = 1e-3  # f32 vs the reference's f64 goldens
EPS = 1e-4


def ray_from_two_points(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = b - a
    d = d / np.linalg.norm(d)
    return (
        jnp.asarray(a[:, None], jnp.float32),
        jnp.asarray(d[:, None], jnp.float32),
    )


def sphere_scene(centre, radius, mat=None):
    sb = SceneBuilder()
    sb.add_sphere(centre, radius, mat or MaterialSpec.make_diffuse((1, 1, 1)))
    return sb.build()


def one_triangle(v0, v1, v2, normals=None):
    sb = SceneBuilder()
    sb.add_triangle(v0, v1, v2, MaterialSpec.make_diffuse((1, 1, 1)), normals=normals)
    return sb.build()


class TestSphere:
    def test_golden_hit(self):
        # test/oo/SphereTests.cpp:19-33
        scene = sphere_scene((10, 20, 30), 15)
        org, dirn = ray_from_two_points((0, 0, 0), (10, 20, 30))
        h = intersect_scene(scene, org, dirn, EPS)
        assert bool(h.hit[0])
        assert float(h.t[0]) == pytest.approx(22.416738, abs=1e-3)
        np.testing.assert_allclose(
            h.pos[:, 0], [5.99108, 11.9822, 17.9732], atol=1e-3
        )
        np.testing.assert_allclose(
            h.normal[:, 0], [-0.267261, -0.534522, -0.801784], atol=1e-3
        )
        assert not bool(h.inside[0])

    def test_miss(self):
        scene = sphere_scene((10, 20, 30), 15)
        for target in [(0, 1, 0), (-10, -20, -30)]:
            org, dirn = ray_from_two_points((0, 0, 0), target)
            h = intersect_scene(scene, org, dirn, EPS)
            assert not bool(h.hit[0])
            assert not np.isfinite(float(h.t[0]))

    def test_known_intersection_point(self):
        # test/oo/SphereTests.cpp:36-44
        scene = sphere_scene((0, 0, 30), 10)
        org, dirn = ray_from_two_points((0, 0, 0), (0, 0, 2))
        h = intersect_scene(scene, org, dirn, EPS)
        assert float(h.t[0]) == pytest.approx(20.0, abs=1e-3)
        np.testing.assert_allclose(h.pos[:, 0], [0, 0, 20], atol=1e-3)
        np.testing.assert_allclose(h.normal[:, 0], [0, 0, -1], atol=1e-3)
        assert not bool(h.inside[0])

    def test_from_inside(self):
        # test/oo/SphereTests.cpp:46-54
        scene = sphere_scene((0, 0, 30), 10)
        org, dirn = ray_from_two_points((0, 0, 30), (0, 0, 2))
        h = intersect_scene(scene, org, dirn, EPS)
        assert float(h.t[0]) == pytest.approx(10.0, abs=1e-3)
        np.testing.assert_allclose(h.pos[:, 0], [0, 0, 20], atol=1e-3)
        np.testing.assert_allclose(h.normal[:, 0], [0, 0, 1], atol=1e-3)
        assert bool(h.inside[0])

    def test_nearer_than_culling_contract(self):
        # dod exposes the nearerThan contract (test/dod/SphereTests.cpp:29-30):
        # a valid hit at t=20 is found; triangles strictly behind it lose.
        sph = sphere_scene((0, 0, 30), 10).spheres
        org = jnp.zeros((3, 1), jnp.float32)
        dirn = jnp.asarray([[0.0], [0.0], [1.0]], jnp.float32)
        t, idx = intersect_spheres(
            org, dirn, sph.centre, sph.radius_sq, sph.centre_sq, EPS
        )
        assert float(t[0]) == pytest.approx(20.0, abs=1e-3)


class TestTriangle:
    def test_hit_both_windings(self):
        # test/{oo,dod}/TriangleTests.cpp: winding only flips the normal
        for winding in [((0, 0, 5), (2, 0, 5), (0, 2, 5)),
                        ((0, 0, 5), (0, 2, 5), (2, 0, 5))]:
            scene = one_triangle(*winding)
            org, dirn = ray_from_two_points((0.5, 0.5, 0), (0.5, 0.5, 5))
            h = intersect_scene(scene, org, dirn, EPS)
            assert bool(h.hit[0])
            assert float(h.t[0]) == pytest.approx(5.0, abs=1e-3)
            # normal always opposes the ray
            assert float(jnp.sum(h.normal[:, 0] * dirn[:, 0])) < 0

    def test_backface_flag(self):
        # anticlockwise winding seen from the ray side -> inside/backfacing
        scene_ccw = one_triangle((0, 0, 5), (2, 0, 5), (0, 2, 5))
        org, dirn = ray_from_two_points((0.5, 0.5, 0), (0.5, 0.5, 5))
        h = intersect_scene(scene_ccw, org, dirn, EPS)
        scene_cw = one_triangle((0, 0, 5), (0, 2, 5), (2, 0, 5))
        h2 = intersect_scene(scene_cw, org, dirn, EPS)
        assert bool(h.inside[0]) != bool(h2.inside[0])

    def test_miss_outside(self):
        scene = one_triangle((0, 0, 5), (2, 0, 5), (0, 2, 5))
        org, dirn = ray_from_two_points((1.9, 1.9, 0), (1.9, 1.9, 5))  # u+v>1
        h = intersect_scene(scene, org, dirn, EPS)
        assert not bool(h.hit[0])

    def test_parallel_ray(self):
        scene = one_triangle((0, 0, 5), (2, 0, 5), (0, 2, 5))
        org = jnp.zeros((3, 1), jnp.float32)
        dirn = jnp.asarray([[1.0], [0.0], [0.0]], jnp.float32)
        h = intersect_scene(scene, org, dirn, EPS)
        assert not bool(h.hit[0])

    def test_vertex_normal_interpolation(self):
        # normals interpolate with the reference's (approximate) scheme
        # n = n0 + u*(n1-n0) + v*(n2-n0) (src/dod/Scene.cpp:99-113)
        normals = np.array([[0, 0, -1], [1, 0, 0], [0, 1, 0]], np.float64)
        scene = one_triangle((0, 0, 5), (2, 0, 5), (0, 2, 5), normals=normals)
        # near vertex 1 (u ~ 1): normal ~ n1 but flipped to oppose +z ray;
        # n1 has no z-component so check it is dominated by n1's direction.
        org, dirn = ray_from_two_points((1.98, 0.01, 0), (1.98, 0.01, 5))
        h = intersect_scene(scene, org, dirn, EPS)
        assert bool(h.hit[0])
        n = np.asarray(h.normal[:, 0])
        assert abs(n[0]) > 0.95  # dominated by n1 = +x

    def test_chunked_matches_direct(self, rng_np):
        # chunked triangle reduction must agree with the single block
        sb = SceneBuilder()
        mat = MaterialSpec.make_diffuse((1, 1, 1))
        for _ in range(37):
            base = rng_np.uniform(-3, 3, size=3)
            sb.add_triangle(
                base, base + rng_np.normal(size=3), base + rng_np.normal(size=3), mat
            )
        scene = sb.build()
        org = jnp.asarray(rng_np.uniform(-5, 5, size=(3, 64)), jnp.float32)
        d = rng_np.normal(size=(3, 64))
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        dirn = jnp.asarray(d, jnp.float32)
        t1, i1 = intersect_triangles(org, dirn, scene.triangles.woop, EPS, 1024)
        t2, i2 = intersect_triangles(org, dirn, scene.triangles.woop, EPS, 8)
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(t1), posinf=1e30),
            np.nan_to_num(np.asarray(t2), posinf=1e30),
            rtol=1e-6,
        )
        hit = np.isfinite(np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(i1)[hit], np.asarray(i2)[hit])


class TestSceneOrdering:
    def test_nearest_of_two_spheres(self):
        # test/dod/SceneTests.cpp:56-81
        sb = SceneBuilder()
        near_mat = MaterialSpec.make_diffuse((1, 0, 0))
        far_mat = MaterialSpec.make_diffuse((0, 1, 0))
        sb.add_sphere((0, 0, 10), 1, near_mat)
        sb.add_sphere((0, 0, 20), 1, far_mat)
        scene = sb.build()
        org, dirn = ray_from_two_points((0, 0, 0), (0, 0, 1))
        h = intersect_scene(scene, org, dirn, EPS)
        assert float(h.t[0]) == pytest.approx(9.0, abs=1e-3)
        np.testing.assert_allclose(
            scene.materials.diffuse[int(h.mat_id[0])], [1, 0, 0], atol=1e-6
        )

    def test_triangle_beats_farther_sphere(self):
        sb = SceneBuilder()
        sb.add_sphere((0, 0, 20), 1, MaterialSpec.make_diffuse((0, 1, 0)))
        sb.add_triangle(
            (-5, -5, 10), (5, -5, 10), (0, 5, 10), MaterialSpec.make_diffuse((1, 0, 0))
        )
        scene = sb.build()
        org, dirn = ray_from_two_points((0, 0, 0), (0, 0, 1))
        h = intersect_scene(scene, org, dirn, EPS)
        assert float(h.t[0]) == pytest.approx(10.0, abs=1e-3)
        np.testing.assert_allclose(
            scene.materials.diffuse[int(h.mat_id[0])], [1, 0, 0], atol=1e-6
        )

    def test_sphere_beats_farther_triangle(self):
        sb = SceneBuilder()
        sb.add_sphere((0, 0, 10), 1, MaterialSpec.make_diffuse((0, 1, 0)))
        sb.add_triangle(
            (-5, -5, 20), (5, -5, 20), (0, 5, 20), MaterialSpec.make_diffuse((1, 0, 0))
        )
        scene = sb.build()
        org, dirn = ray_from_two_points((0, 0, 0), (0, 0, 1))
        h = intersect_scene(scene, org, dirn, EPS)
        assert float(h.t[0]) == pytest.approx(9.0, abs=1e-3)
        np.testing.assert_allclose(
            scene.materials.diffuse[int(h.mat_id[0])], [0, 1, 0], atol=1e-6
        )
