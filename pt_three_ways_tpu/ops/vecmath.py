"""Batched 3-vector math for TPU — component-major ("planar") layout.

Vectors are arrays of shape [3, *batch]: axis 0 is x/y/z, batch axes trail.
This is the load-bearing TPU layout decision in the framework: the minor
(lane) dimension is the large ray batch, so every elementwise op runs at
full VPU lane utilisation. The obvious [..., 3] layout pads the 3-component
axis to 128 lanes on TPU — a measured ~40x memory-traffic blowup that made
the first implementation 10x off speed-of-light.

Broadcasting falls out naturally: a scalar field [N] combines with a vector
[3, N] without reshapes, and a single constant vector has shape (3,).

TPU-native re-design of the reference math layer (pt-three-ways
``src/math/{Vec3,Norm3,OrthoNormalBasis,Samples}``). Reference parity notes
(file:line cites refer to /root/reference):
  - ``reflect``      == Norm3::reflect (src/math/Norm3.impl.h:42-45)
  - ``reflectance``  == Norm3::reflectance (src/math/Norm3.cpp:7-24), including
    the reference's quirk that rPerpendicular and rParallel use the *same*
    formula — we replicate it so images match.
  - ``onb_from_z``   == OrthoNormalBasis::fromZ (src/math/OrthoNormalBasis.cpp:41-52)
  - ``onb_from_zy``  == OrthoNormalBasis::fromZY (src/math/OrthoNormalBasis.cpp:34-39)
  - ``cone_sample``  == coneSample (src/math/Samples.cpp:6-20)
  - ``hemisphere_sample`` == hemisphereSample (src/math/Samples.cpp:22-31)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

# Geometric epsilon. The reference uses 1e-9 with f64 (src/math/Epsilon.h:3);
# we compute in f32 on TPU so the default is scaled up. Scenes with large
# coordinates (smallpt's 1e5-radius walls) override this per scene.
EPSILON = 1e-4


def vec3(x, y, z) -> jnp.ndarray:
    """Stack three scalar fields into a [3, *batch] vector."""
    return jnp.stack([x, y, z], axis=0)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the leading xyz axis -> [*batch]."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return vec3(
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length_sq(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sq(a))


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt clamped at 0 with a non-NaN gradient at/below 0.

    The double-where keeps the untaken branch's infinite cotangent out of the
    backward pass (sqrt'(0) = inf would otherwise poison masked lanes).
    """
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.sqrt(x)


def normalise(a: jnp.ndarray) -> jnp.ndarray:
    """Unit vector; safe for zero input (returns 0, with a finite grad)."""
    n2 = length_sq(a)
    pos = n2 > 0
    inv = jnp.where(pos, jax_rsqrt(jnp.where(pos, n2, 1.0)), 0.0)
    return a * inv


def scale(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """v * s for scalar field s (broadcast helper; trailing axes align)."""
    return v * s


def reflect(incoming: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror ``incoming`` about ``normal`` (both unit). Norm3.impl.h:42-45."""
    return incoming - normal * (2.0 * dot(incoming, normal))


def reflectance(
    normal: jnp.ndarray,
    incoming: jnp.ndarray,
    ior_from: jnp.ndarray,
    ior_to: jnp.ndarray,
) -> jnp.ndarray:
    """Fresnel reflectance with total-internal-reflection clamp.

    Faithful to Norm3::reflectance (src/math/Norm3.cpp:7-24). NOTE: the
    reference computes rPerpendicular and rParallel with the *identical*
    expression (a transcription slip vs. the cited de Greve note); the mean of
    the two squares therefore equals rPerpendicular^2. We reproduce that
    behaviour exactly, because the rendered images depend on it.
    """
    ior_ratio = ior_from / ior_to
    cos_i = -dot(incoming, normal)
    sin_t_sq = ior_ratio * ior_ratio * (1.0 - cos_i * cos_i)
    cos_t = safe_sqrt(1.0 - sin_t_sq)
    # Double-where denominator guard: an f32-exact grazing hit (cos_i == 0)
    # at the TIR boundary (sin_t_sq == 1 -> cos_t == 0) makes this 0/0.
    # The NaN was value-masked in every practical config, but its PARTIALS
    # leak through zero cotangents under autodiff (NaN * 0 == NaN) — found
    # on hardware at 1M-lane scale, round 5. The substituted 1.0 is the
    # TIR-side limit; the reference's f64 math hits the same 0/0 only on a
    # measure-zero set it never lands on.
    den = ior_from * cos_i + ior_to * cos_t
    ok = den > 0.0
    r_perp = jnp.where(
        ok,
        (ior_from * cos_i - ior_to * cos_t) / jnp.where(ok, den, 1.0),
        1.0,
    )
    fresnel = r_perp * r_perp
    return jnp.where(sin_t_sq > 1.0, 1.0, fresnel)


class Onb(NamedTuple):
    """Orthonormal basis, each axis [3, *batch]."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def transform(self, v: jnp.ndarray) -> jnp.ndarray:
        """x*v_x + y*v_y + z*v_z (OrthoNormalBasis.h:19-21)."""
        return self.x * v[0] + self.y * v[1] + self.z * v[2]


_COINCIDENT = 0.9999


def _const_vec(template: jnp.ndarray, x: float, y: float, z: float):
    v = jnp.asarray([x, y, z], template.dtype)
    return v.reshape((3,) + (1,) * (template.ndim - 1))


def onb_from_z(z: jnp.ndarray) -> Onb:
    """Basis around unit z with coincident-axis guard at 0.9999.

    OrthoNormalBasis::fromZ (src/math/OrthoNormalBasis.cpp:41-52), expressed
    branch-free with jnp.where so it vectorises.
    """
    use_y = jnp.abs(z[0]) > _COINCIDENT
    pivot = jnp.where(
        use_y,
        _const_vec(z, 0.0, 1.0, 0.0),
        _const_vec(z, 1.0, 0.0, 0.0),
    )
    xx = normalise(cross(pivot, z))
    yy = normalise(cross(z, xx))
    return Onb(xx, yy, z)


def onb_from_zy(z: jnp.ndarray, y: jnp.ndarray) -> Onb:
    """fromZY: xx = (y x z).norm; yy = z x xx (OrthoNormalBasis.cpp:34-39)."""
    xx = normalise(cross(y, z))
    yy = cross(z, xx)
    return Onb(xx, yy, z)


def cone_sample(
    direction: jnp.ndarray,
    cone_theta: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Glossy cone sample around ``direction`` (src/math/Samples.cpp:6-20).

    The reference early-returns ``direction`` when coneTheta < Epsilon; we do
    the same with a where so perfect mirrors stay exact.
    """
    theta = cone_theta * (1.0 - 2.0 * jnp.arccos(jnp.clip(u, 0.0, 1.0)) / math.pi)
    radius = jnp.sin(theta)
    z_scale = jnp.cos(theta)
    random_theta = v * (2.0 * math.pi)
    basis = onb_from_z(direction)
    sampled = normalise(
        basis.transform(
            vec3(
                jnp.cos(random_theta) * radius,
                jnp.sin(random_theta) * radius,
                z_scale,
            )
        )
    )
    mirror = cone_theta < EPSILON
    return jnp.where(mirror, direction, sampled)


def hemisphere_sample(basis: Onb, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample (src/math/Samples.cpp:22-31)."""
    theta = (2.0 * math.pi) * u
    radius = jnp.sqrt(v)
    return normalise(
        basis.transform(
            vec3(
                jnp.cos(theta) * radius,
                jnp.sin(theta) * radius,
                safe_sqrt(1.0 - v),
            )
        )
    )
