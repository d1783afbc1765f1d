"""Pinhole + thin-lens camera, batched over rays.

Faithful to the reference Camera (src/math/Camera.h:10-62):
  * basis = OrthoNormalBasis::fromZY(normalise(lookAt - eye), up)
  * plane distance = 1 / tan(verticalFov * pi / 360)
  * unit mapping (2x-1, 2y-1) with negated x/y axis contributions
    (Camera.h:21-24, 55-61)
  * thin-lens depth of field samples the aperture disc uniformly in RADIUS
    (not area) — a reference quirk we replicate for image parity
    (Camera.h:30-34).

The camera is a NamedTuple of jnp arrays, so it is a pytree: jit-traceable
and differentiable (pixel gradients w.r.t. eye/axis/aperture flow through
ray generation).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .vecmath import normalise, onb_from_zy


class Camera(NamedTuple):
    centre: jnp.ndarray  # [3]
    axis_x: jnp.ndarray  # [3]
    axis_y: jnp.ndarray  # [3]
    axis_z: jnp.ndarray  # [3]
    aspect: jnp.ndarray  # []
    plane_dist: jnp.ndarray  # []
    recip_w: jnp.ndarray  # []
    recip_h: jnp.ndarray  # []
    aperture: jnp.ndarray  # []
    focal_dist: jnp.ndarray  # []


def make_camera(
    eye, look_at, up, width: int, height: int, vertical_fov_degrees: float,
    dtype=jnp.float32,
) -> Camera:
    eye = np.asarray(eye, np.float64).reshape(3)
    look_at = np.asarray(look_at, np.float64).reshape(3)
    up = np.asarray(up, np.float64).reshape(3)
    up = up / np.linalg.norm(up)
    z = look_at - eye
    z = z / np.linalg.norm(z)
    # fromZY (src/math/OrthoNormalBasis.cpp:34-39), computed on host in f64.
    xx = np.cross(up, z)
    xx = xx / np.linalg.norm(xx)
    yy = np.cross(z, xx)
    return Camera(
        centre=jnp.asarray(eye, dtype),
        axis_x=jnp.asarray(xx, dtype),
        axis_y=jnp.asarray(yy, dtype),
        axis_z=jnp.asarray(z, dtype),
        aspect=jnp.asarray(width / height, dtype),
        plane_dist=jnp.asarray(
            1.0 / math.tan(vertical_fov_degrees * math.pi / 360.0), dtype
        ),
        recip_w=jnp.asarray(1.0 / width, dtype),
        recip_h=jnp.asarray(1.0 / height, dtype),
        aperture=jnp.asarray(0.0, dtype),
        focal_dist=jnp.asarray(0.0, dtype),
    )


def set_focus(camera: Camera, focal_point, aperture_radius: float) -> Camera:
    """Camera::setFocus (src/math/Camera.h:48-51)."""
    fp = jnp.asarray(np.asarray(focal_point, np.float64), camera.centre.dtype)
    focal_dist = jnp.sqrt(jnp.sum((fp - camera.centre) ** 2))
    return camera._replace(
        aperture=jnp.asarray(aperture_radius, camera.centre.dtype),
        focal_dist=focal_dist,
    )


def generate_rays(
    camera: Camera,
    px: jnp.ndarray,  # [R] int pixel x
    py: jnp.ndarray,  # [R] int pixel y
    uniforms: jnp.ndarray,  # [4, R] in [0,1): jitter x, jitter y, angle, radius
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera::randomRay for a batch of pixels (src/math/Camera.h:55-61).

    Returns (origins [3, R], directions [3, R]) — component-major.
    """
    dtype = camera.centre.dtype
    x = (px.astype(dtype) + uniforms[0]) * camera.recip_w
    y = (py.astype(dtype) + uniforms[1]) * camera.recip_h
    ux = 2.0 * x - 1.0
    uy = 2.0 * y - 1.0
    # rayFromUnit (Camera.h:20-37)
    direction = normalise(
        camera.axis_x[:, None] * (-ux * camera.aspect)
        + camera.axis_y[:, None] * (-uy)
        + camera.axis_z[:, None] * camera.plane_dist
    )
    pinhole_org = jnp.broadcast_to(camera.centre[:, None], direction.shape)

    # Thin-lens: uniform angle, uniform radius (NOT uniform area) — Camera.h:30-34.
    focal_point = camera.centre[:, None] + direction * camera.focal_dist
    angle = uniforms[2] * (2.0 * math.pi)
    radius = uniforms[3] * camera.aperture
    lens_org = (
        camera.centre[:, None]
        + camera.axis_x[:, None] * (jnp.cos(angle) * radius)
        + camera.axis_y[:, None] * (jnp.sin(angle) * radius)
    )
    lens_dir = normalise(focal_point - lens_org)

    use_lens = camera.aperture > 0.0
    org = jnp.where(use_lens, lens_org, pinhole_org)
    dirn = jnp.where(use_lens, lens_dir, direction)
    return org, dirn
