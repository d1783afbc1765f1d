"""smallpt sidecar: the ground-truth integrator with the features the three
ways dropped — Russian roulette and true dielectric refraction.

Faithful wavefront port of the vendored smallpt.cpp (src/smallpt/smallpt.cpp,
Kevin Beason's 99-line tracer):

  * the 9-sphere Cornell scene (smallpt.cpp:57-73);
  * smallpt's own camera: 2x2 subpixel grid with a tent filter, rays pushed
    140 units forward, image y-flipped (smallpt.cpp:140-160);
  * radiance: black env on miss, emission at every hit, Russian roulette
    after depth 5 with survival p = max component of albedo
    (smallpt.cpp:98-103); DIFF cosine sampling with smallpt's own ONB
    (|w.x| > .1 pivot — NOT the 0.9999 one), SPEC mirror, REFR
    Schlick-Fresnel dielectric with reflect/refract Russian roulette
    (smallpt.cpp:104-137);
  * per-subpixel clamp before accumulation (smallpt.cpp:158-159).

One deliberate deviation: smallpt evaluates BOTH refraction branches for
depth <= 2 (a recursive split, smallpt.cpp:133-136). A wavefront cannot
split paths, so we always Russian-roulette between reflect and refract with
the same P = .25 + .5*Re weights — identical expectation, slightly higher
variance at low depth.

Float note: the walls are 1e5-radius spheres, which is hostile to f32
quadratics; the integrator defaults to a scene-scaled epsilon of 0.05 (the
scene unit is ~100) which suppresses self-intersection acne without visible
bias.

Layout: component-major ([3, N]) like the rest of the framework.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng
from ..ops.gather import onehot_gather
from ..ops.vecmath import cross, dot, normalise, reflect, safe_sqrt, vec3

DIFF, SPEC, REFR = 0, 1, 2

# radius, position, emission, colour, material (smallpt.cpp:57-73)
_SPHERES = [
    (1e5, (1e5 + 1, 40.8, 81.6), (0, 0, 0), (0.75, 0.25, 0.25), DIFF),  # left
    (1e5, (-1e5 + 99, 40.8, 81.6), (0, 0, 0), (0.25, 0.25, 0.75), DIFF),  # right
    (1e5, (50, 40.8, 1e5), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),  # back
    (1e5, (50, 40.8, -1e5 + 170), (0, 0, 0), (0, 0, 0), DIFF),  # front
    (1e5, (50, 1e5, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),  # bottom
    (1e5, (50, -1e5 + 81.6, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),  # top
    (16.5, (27, 16.5, 47), (0, 0, 0), (0.999, 0.999, 0.999), SPEC),  # mirror
    (16.5, (73, 16.5, 78), (0, 0, 0), (0.999, 0.999, 0.999), REFR),  # glass
    (600, (50, 681.6 - 0.27, 81.6), (12, 12, 12), (0, 0, 0), DIFF),  # light
]

EPS = 1e-3  # df64 quadratic (below) leaves ~1e-4-scale t error at t~100


# --- double-single ("df64") arithmetic for the sphere quadratic ---------
#
# The walls are 1e5-radius spheres: det = b^2 - |op|^2 + r^2 cancels three
# ~1e10 f32 terms, leaving ~±0.5 units of error on hit distances near
# grazing — enough to visibly enlarge the ceiling light's disk (the
# light-vs-ceiling winner race fuzzes; measured +68% disk area). Each value
# is carried as an (hi, lo) f32 pair with error-free transforms
# (Knuth two-sum, Dekker two-prod), recovering ~f64 precision on TPU
# hardware that has none.

_SPLIT = 4097.0  # 2^12 + 1 for f32 Dekker splitting


def _two_sum(a, b):
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _two_diff(a, b):
    s = a - b
    v = s - a
    e = (a - (s - v)) - (b + v)
    return s, e


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _dd_add(x, y):
    """(hi,lo) + (hi,lo)"""
    s, e = _two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    hi, lo = _two_sum(s, e)
    return hi, lo


def _dd_mul_ff(a, b):
    """f32 * f32 -> dd"""
    return _two_prod(a, b)


def _dd_mul_dd_f(x, f):
    """dd * f32 -> dd"""
    p, e = _two_prod(x[0], f)
    e = e + x[1] * f
    hi, lo = _two_sum(p, e)
    return hi, lo


def _dd_neg(x):
    return -x[0], -x[1]


def _dd_sqr(x):
    """dd^2 -> dd (drops the lo*lo term)"""
    p, e = _two_prod(x[0], x[0])
    e = e + 2.0 * x[0] * x[1]
    hi, lo = _two_sum(p, e)
    return hi, lo


class SmallptScene(NamedTuple):
    centre: jnp.ndarray  # [S, 3]
    radius_sq: jnp.ndarray  # [S] hi part of r^2 (df64)
    radius_sq_lo: jnp.ndarray  # [S] lo part of r^2
    emission: jnp.ndarray  # [S, 3]
    colour: jnp.ndarray  # [S, 3]
    refl_type: jnp.ndarray  # [S] int32


def smallpt_scene(dtype=jnp.float32) -> SmallptScene:
    centre = np.array([s[1] for s in _SPHERES], np.float64)
    radius = np.array([s[0] for s in _SPHERES], np.float64)
    r2 = radius * radius
    r2_hi = r2.astype(np.float32).astype(np.float64)
    r2_lo = r2 - r2_hi
    return SmallptScene(
        centre=jnp.asarray(centre, dtype),
        radius_sq=jnp.asarray(r2_hi, dtype),
        radius_sq_lo=jnp.asarray(r2_lo, dtype),
        emission=jnp.asarray([s[2] for s in _SPHERES], dtype),
        colour=jnp.asarray([s[3] for s in _SPHERES], dtype),
        refl_type=jnp.asarray([s[4] for s in _SPHERES], jnp.int32),
    )


def _intersect(scene: SmallptScene, org, dirn):
    """smallpt sphere test on [3,R] rays (smallpt.cpp:45-53), [S,R] tiles,
    with the quadratic evaluated in df64 (see the double-single helpers
    above): plain f32 leaves ~±0.5 units of error on wall-hit distances and
    visibly distorts the light-vs-ceiling winner near the light's rim.
    """
    # op = c - o as dd, per component
    opx = _two_diff(scene.centre[:, 0:1], org[0][None, :])
    opy = _two_diff(scene.centre[:, 1:2], org[1][None, :])
    opz = _two_diff(scene.centre[:, 2:3], org[2][None, :])
    # b = op . d (dd)
    b = _dd_add(
        _dd_add(_dd_mul_dd_f(opx, dirn[0]), _dd_mul_dd_f(opy, dirn[1])),
        _dd_mul_dd_f(opz, dirn[2]),
    )
    # det = b^2 - |op|^2 + r^2 (dd)
    op2 = _dd_add(_dd_add(_dd_sqr(opx), _dd_sqr(opy)), _dd_sqr(opz))
    r2 = (scene.radius_sq[:, None], scene.radius_sq_lo[:, None])
    det = _dd_add(_dd_add(_dd_sqr(b), _dd_neg(op2)), r2)
    det_hi = det[0] + det[1]
    ok = det_hi >= 0.0
    # sqrt with one dd Newton refinement
    s0 = jnp.sqrt(jnp.where(ok, det_hi, 0.0))
    s0_sq = _two_prod(s0, s0)
    resid = _dd_add(det, _dd_neg(s0_sq))
    corr = jnp.where(s0 > 0, (resid[0] + resid[1]) / (2.0 * jnp.where(s0 > 0, s0, 1.0)), 0.0)
    # roots: b -/+ sqrt(det), recombined at f32 with the dd tails
    mt = _two_diff(b[0], s0)
    minus_t = mt[0] + (mt[1] + b[1] - corr)
    pt = _two_sum(b[0], s0)
    plus_t = pt[0] + (pt[1] + b[1] + corr)
    t = jnp.where(minus_t > EPS, minus_t, plus_t)
    valid = ok & (t > EPS)
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.min(t, axis=0)
    idx = jnp.argmin(t, axis=0).astype(jnp.int32)
    return best, idx


def _bounce(scene: SmallptScene, state, uniforms, depth: int):
    """One smallpt bounce over all live paths (smallpt.cpp:90-138)."""
    org, dirn, beta, acc, alive = state
    u1, u2, u_rr, u_refr = uniforms
    t, idx = _intersect(scene, org, dirn)
    found = jnp.isfinite(t)
    live = alive & found
    t_safe = jnp.where(found, t, 0.0)
    x = org + t_safe * dirn
    # winner data (centre, colour, emission, type) in one one-hot matmul
    coef = jnp.concatenate(
        [
            scene.centre.T,
            scene.colour.T,
            scene.emission.T,
            scene.refl_type.astype(scene.centre.dtype)[None, :],
        ],
        axis=0,
    )  # [10, S]
    g = onehot_gather(coef, idx)
    n = normalise(x - g[0:3])
    nl = jnp.where(dot(n, dirn) < 0, n, -n)
    f = g[3:6]
    e = g[6:9]
    refl_kind = jnp.round(g[9]).astype(jnp.int32)

    acc = acc + jnp.where(live, beta * e, 0.0)

    # Russian roulette after depth 5 (depth here counts this hit, 1-based)
    if depth + 1 > 5:
        p = jnp.maximum(jnp.maximum(f[0], f[1]), f[2])
        survive = u_rr < p
        f = f / jnp.maximum(p, 1e-12)
        live = live & survive

    refl = refl_kind

    # DIFF: cosine-weighted with smallpt's basis (smallpt.cpp:105-111)
    r1 = 2.0 * math.pi * u1
    r2 = u2
    r2s = jnp.sqrt(r2)
    w = nl
    use_y = jnp.abs(w[0]) > 0.1
    pivot = jnp.where(
        use_y,
        jnp.asarray([0.0, 1.0, 0.0], w.dtype).reshape(3, 1),
        jnp.asarray([1.0, 0.0, 0.0], w.dtype).reshape(3, 1),
    )
    uax = normalise(cross(pivot, w))
    vax = cross(w, uax)
    d_diff = normalise(
        uax * (jnp.cos(r1) * r2s)
        + vax * (jnp.sin(r1) * r2s)
        + w * safe_sqrt(1.0 - r2)
    )

    # SPEC: mirror (smallpt.cpp:112-114)
    d_spec = reflect(dirn, n)

    # REFR: dielectric with Schlick Fresnel (smallpt.cpp:115-137)
    into = dot(n, nl) > 0
    nc, nt = 1.0, 1.5
    nnt = jnp.where(into, nc / nt, nt / nc)
    ddn = dot(dirn, nl)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0
    sgn = jnp.where(into, 1.0, -1.0)
    tdir = normalise(dirn * nnt - n * (sgn * (ddn * nnt + safe_sqrt(cos2t))))
    a, b_ = nt - nc, nt + nc
    r0 = (a * a) / (b_ * b_)
    c = 1.0 - jnp.where(into, -ddn, dot(tdir, n))
    re = r0 + (1.0 - r0) * c**5
    tr = 1.0 - re
    prob = 0.25 + 0.5 * re
    pick_refl = u_refr < prob
    d_refr = jnp.where(tir, d_spec, jnp.where(pick_refl, d_spec, tdir))
    w_refr = jnp.where(tir, 1.0, jnp.where(pick_refl, re / prob, tr / (1.0 - prob)))

    is_diff = refl == DIFF
    is_spec = refl == SPEC
    new_dir = jnp.where(is_diff, d_diff, jnp.where(is_spec, d_spec, d_refr))
    weight = jnp.where(is_diff | is_spec, 1.0, w_refr)
    new_beta = beta * f * weight

    return (
        jnp.where(live, x, org),
        jnp.where(live, new_dir, dirn),
        jnp.where(live, new_beta, beta),
        acc,
        live,
    )


def _camera_rays(key, px, py, sx, sy, width, height, dtype):
    """smallpt camera with tent filter (smallpt.cpp:142-157). -> [3, R]."""
    cam_o = jnp.asarray([50.0, 52.0, 295.6], dtype).reshape(3, 1)
    cam_dir = np.array([0.0, -0.042612, -1.0])
    cam_dir = cam_dir / np.linalg.norm(cam_dir)
    cx_v = np.array([width * 0.5135 / height, 0.0, 0.0])
    cy_v = np.cross(cx_v, cam_dir)
    cy_v = cy_v / np.linalg.norm(cy_v) * 0.5135
    cam_d = jnp.asarray(cam_dir, dtype).reshape(3, 1)
    cx = jnp.asarray(cx_v, dtype).reshape(3, 1)
    cy = jnp.asarray(cy_v, dtype).reshape(3, 1)

    us = rng.uniforms(key, (2, px.shape[0]), dtype)
    r1 = 2.0 * us[0]
    dx = jnp.where(r1 < 1, jnp.sqrt(r1) - 1, 1 - safe_sqrt(2 - r1))
    r2 = 2.0 * us[1]
    dy = jnp.where(r2 < 1, jnp.sqrt(r2) - 1, 1 - safe_sqrt(2 - r2))
    fx = ((sx + 0.5 + dx) / 2.0 + px.astype(dtype)) / width - 0.5
    fy = ((sy + 0.5 + dy) / 2.0 + py.astype(dtype)) / height - 0.5
    d = cx * fx + cy * fy + cam_d
    # The push-forward uses the NORMALISED direction: smallpt.cpp:157 reads
    # ``Ray(cam.o + d * 140, d.norm())`` where ``d.norm()`` MUTATES d and
    # gcc evaluates the arguments right-to-left, so the binary the images
    # come from pushes along unit d. (Reading the source left-to-right gives
    # unnormalised d — round 1 did that, which starts top-row rays inside
    # the LIGHT sphere instead of inside the box: +18.5% unclamped
    # brightness. tools/compare_smallpt_unclamped.py is the probe.)
    dn = normalise(d)
    org = cam_o + dn * 140.0
    return org, dn


def radiance_pass(
    scene: SmallptScene,
    key: jax.Array,
    px: jnp.ndarray,
    py: jnp.ndarray,
    sx: int,
    sy: int,
    width: int,
    height: int,
    max_bounces: int = 40,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Radiance of one 1-sample pass at subpixel (sx, sy) -> [R, 3]."""
    n = px.shape[0]
    cam_key = rng.stream_key(key, rng.CAMERA_STREAM)
    org, dirn = _camera_rays(cam_key, px, py, sx, sy, width, height, dtype)
    state = (
        org,
        dirn,
        jnp.ones((3, n), dtype),
        jnp.zeros((3, n), dtype),
        jnp.ones((n,), bool),
    )
    bkey = rng.stream_key(key, rng.BOUNCE_STREAM_BASE)

    # RR applies from depth 5 on; split at the boundary so the
    # `depth + 1 > 5` python-if in _bounce stays static per segment:
    # depths 0..4 unrolled (no RR), then a scan over 5..max_bounces-1 (RR).
    pre = min(5, max_bounces)
    for depth in range(pre):
        state = _bounce(
            scene,
            state,
            tuple(rng.uniforms(jax.random.fold_in(bkey, depth), (4, n), dtype)),
            depth,
        )
    if max_bounces > 5:

        def step_rr(st, depth):
            u = rng.uniforms(jax.random.fold_in(bkey, depth), (4, n), dtype)
            return _bounce(scene, st, (u[0], u[1], u[2], u[3]), 5), None

        state, _ = jax.lax.scan(step_rr, state, jnp.arange(5, max_bounces))
    return state[3].T


def render_smallpt(
    width: int,
    height: int,
    spp: int,
    seed: int = 1,
    max_bounces: int = 40,
    dtype=jnp.float32,
    clamp_subpixels: bool = True,
) -> np.ndarray:
    """Full smallpt render -> [H, W, 3] linear image (y already flipped to
    match smallpt's PPM row order, smallpt.cpp:147 ``i=(h-y-1)*w+x``)."""
    scene = smallpt_scene(dtype)
    samps = max(spp // 4, 1)
    xs = jnp.asarray(np.tile(np.arange(width, dtype=np.int32), height))
    ys = jnp.asarray(np.repeat(np.arange(height, dtype=np.int32), width))

    fn = jax.jit(
        lambda k, sx, sy: radiance_pass(
            scene, k, xs, ys, sx, sy, width, height, max_bounces, dtype
        ),
        static_argnums=(1, 2),
    )
    base = rng.base_key(seed)
    img = np.zeros((height * width, 3), np.float64)
    for sy in range(2):
        for sx in range(2):
            sub = np.zeros((height * width, 3), np.float64)
            for s in range(samps):
                k = rng.pass_key(base, ((sy * 2 + sx) << 20) + s)
                sub += np.asarray(fn(k, sx, sy), np.float64)
            sub /= samps
            if clamp_subpixels:
                img += 0.25 * np.clip(sub, 0.0, 1.0)  # smallpt.cpp:158-159
            else:
                img += 0.25 * sub  # estimator-comparison mode (unbiased)
    img = img.reshape(height, width, 3)
    return img[::-1]  # y-flip
