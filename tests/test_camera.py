"""Camera tests (reference behavior: src/math/Camera.h). Rays are
component-major: origins/directions [3, R]."""

import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.ops.camera import generate_rays, make_camera, set_focus


def test_centre_ray_points_at_look_at():
    cam = make_camera((0, 1, 3), (0, 1, 0), (0, 1, 0), 1, 1, 50.0)
    px = jnp.zeros((1,), jnp.int32)
    py = jnp.zeros((1,), jnp.int32)
    u = jnp.full((4, 1), 0.5, jnp.float32)  # pixel centre
    org, dirn = generate_rays(cam, px, py, u)
    np.testing.assert_allclose(org[:, 0], [0, 1, 3], atol=1e-6)
    expected = np.array([0, 0, -3]) / 3.0
    np.testing.assert_allclose(dirn[:, 0], expected, atol=1e-6)


def test_x_mirroring_and_y_down():
    # Unit mapping negates x and y axis contributions (Camera.h:21-24):
    # larger pixel x should push the direction towards -axis_x.
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 100, 100, 90.0)
    u = jnp.full((4, 2), 0.5, jnp.float32)
    px = jnp.asarray([10, 90], jnp.int32)
    py = jnp.asarray([50, 50], jnp.int32)
    _, dirn = generate_rays(cam, px, py, u)
    ax = np.asarray(cam.axis_x)
    d = np.asarray(dirn)
    assert d[:, 0] @ ax > d[:, 1] @ ax  # x increases -> -x axis contribution

    py2 = jnp.asarray([10, 90], jnp.int32)
    px2 = jnp.asarray([50, 50], jnp.int32)
    _, dirn2 = generate_rays(cam, px2, py2, u)
    ay = np.asarray(cam.axis_y)
    d2 = np.asarray(dirn2)
    assert d2[:, 0] @ ay > d2[:, 1] @ ay


def test_aspect_ratio():
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 200, 100, 90.0)
    assert float(cam.aspect) == pytest.approx(2.0)
    assert float(cam.plane_dist) == pytest.approx(1.0, abs=1e-6)


def test_dof_spreads_origins():
    cam = make_camera((0, 0, 0), (0, 0, 10), (0, 1, 0), 64, 64, 45.0)
    cam = set_focus(cam, (0, 0, 10), 0.5)
    assert float(cam.focal_dist) == pytest.approx(10.0)
    # two lens positions, full radius, same pixel jitter
    u = jnp.asarray(
        [[0.5, 0.5], [0.5, 0.5], [0.0, 0.5], [1.0, 1.0]], jnp.float32
    )
    px = jnp.zeros((2,), jnp.int32)
    py = jnp.zeros((2,), jnp.int32)
    org, dirn = generate_rays(cam, px, py, u)
    org = np.asarray(org)
    dirn = np.asarray(dirn)
    assert np.linalg.norm(org[:, 0] - org[:, 1]) > 0.5  # origins differ
    # both rays pass through the shared focal point (centre + dir*focalDist)
    u0 = jnp.full((4, 1), 0.5, jnp.float32)
    _, pin_dir = generate_rays(
        cam._replace(aperture=jnp.float32(0.0)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        u0,
    )
    focal = np.asarray(cam.centre) + np.asarray(pin_dir[:, 0]) * float(cam.focal_dist)
    for i in range(2):
        to_focal = focal - org[:, i]
        cosang = to_focal @ dirn[:, i] / np.linalg.norm(to_focal)
        assert cosang == pytest.approx(1.0, abs=1e-5)


def test_pinhole_when_aperture_zero():
    cam = make_camera((1, 2, 3), (0, 0, 10), (0, 1, 0), 64, 64, 45.0)
    u = jnp.asarray([[0.1], [0.9], [0.3], [0.8]], jnp.float32)
    org, _ = generate_rays(
        cam, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32), u
    )
    np.testing.assert_allclose(org[:, 0], [1, 2, 3], atol=1e-6)
