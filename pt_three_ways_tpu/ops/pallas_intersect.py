"""Fused Pallas intersection kernel: nearest sphere+triangle hit per ray.

The pure-XLA intersector (ops/intersect.py) streams [T, R]/[S, R]
intermediates through HBM; this kernel keeps the whole primitive table and
all per-pair intermediates in VMEM, reading only the ray tile and writing
only (t, packed index) — the memory-traffic-optimal form of the reference's
linear scan (src/dod/Scene.cpp:13-122), with identical semantics (including
the sphere-wins-ties rule and the minusT/plusT epsilon logic).

Packed index convention: triangles are [0, T), spheres are [T, T+S).

Grid: 1D over ray tiles (RT lanes each). Primitive tables are broadcast to
every program (they are small: 12 f32/triangle, 8 f32/sphere) and looped in
sublane chunks of TC/SC inside the kernel, so arbitrary scene sizes fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT = 1024  # rays per program (lanes)
TC = 64  # triangles per inner chunk (sublanes)
SC = 64  # spheres per inner chunk

_PARALLEL_EPS = 1e-12
_INF = jnp.float32(np.inf)


def _intersect_kernel(
    tri_ref,  # [Tpad, 12] VMEM: woop rows (u,v,w) x (cx,cy,cz,c1)
    sph_ref,  # [Spad, 8] VMEM: cx, cy, cz, r^2, |c|^2, pad, pad, pad
    org_ref,  # [3, RT] VMEM
    dir_ref,  # [3, RT] VMEM
    t_ref,  # [1, RT] out
    idx_ref,  # [1, RT] out int32
    *,
    n_tri: int,
    n_sph: int,
    t_pad: int,
    s_pad: int,
    eps: float,
):
    ox = org_ref[0, :]
    oy = org_ref[1, :]
    oz = org_ref[2, :]
    dx = dir_ref[0, :]
    dy = dir_ref[1, :]
    dz = dir_ref[2, :]

    best_t = jnp.full((1, RT), _INF, jnp.float32)
    best_i = jnp.zeros((1, RT), jnp.int32)

    # --- triangles: chunked over sublanes ---
    if n_tri > 0:
        n_tc = t_pad // TC

        def tri_body(c, carry):
            bt, bi = carry
            w = tri_ref[pl.ds(c * TC, TC), :]  # [TC, 12]
            c0 = w[:, 0:1]
            c1 = w[:, 1:2]
            c2 = w[:, 2:3]
            c3 = w[:, 3:4]
            c4 = w[:, 4:5]
            c5 = w[:, 5:6]
            c6 = w[:, 6:7]
            c7 = w[:, 7:8]
            c8 = w[:, 8:9]
            c9 = w[:, 9:10]
            c10 = w[:, 10:11]
            c11 = w[:, 11:12]
            # transformed origin/direction components: [TC, RT]
            o_u = c0 * ox + c1 * oy + c2 * oz + c3
            o_v = c4 * ox + c5 * oy + c6 * oz + c7
            o_w = c8 * ox + c9 * oy + c10 * oz + c11
            d_u = c0 * dx + c1 * dy + c2 * dz
            d_v = c4 * dx + c5 * dy + c6 * dz
            d_w = c8 * dx + c9 * dy + c10 * dz
            not_par = jnp.abs(d_w) > _PARALLEL_EPS
            t = -o_w / jnp.where(not_par, d_w, 1.0)
            u = o_u + t * d_u
            v = o_v + t * d_v
            valid = (
                not_par
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > eps)
            )
            t = jnp.where(valid, t, _INF)
            ct = jnp.min(t, axis=0, keepdims=True)  # [1, RT]
            # manual argmin (lowest index wins ties, like the reference's
            # first-nearest scan): avoids relying on argmin lowering
            rows = jax.lax.broadcasted_iota(jnp.int32, (TC, RT), 0)
            ci = jnp.min(
                jnp.where(t <= ct, rows, jnp.int32(2**30)), axis=0, keepdims=True
            ) + c * TC
            take = ct < bt
            return jnp.where(take, ct, bt), jnp.where(take, ci, bi)

        best_t, best_i = jax.lax.fori_loop(
            0, n_tc, tri_body, (best_t, best_i), unroll=False
        )

    # --- spheres (win exact ties against triangles: strict < for tris is
    # equivalent to processing spheres last with <=; we instead process
    # spheres second with strict < against the triangle best and flip the
    # comparison so the sphere wins ties, matching dod/Scene.cpp:115-122) ---
    if n_sph > 0:
        od = dot3(ox, oy, oz, dx, dy, dz)
        oo = dot3(ox, oy, oz, ox, oy, oz)
        n_sc = s_pad // SC

        def sph_body(c, carry):
            bt, bi = carry
            sp = sph_ref[pl.ds(c * SC, SC), :]  # [SC, 8]
            cx = sp[:, 0:1]
            cy = sp[:, 1:2]
            cz = sp[:, 2:3]
            r2 = sp[:, 3:4]
            cc = sp[:, 4:5]
            b = cx * dx + cy * dy + cz * dz - od
            det = b * b - cc + 2.0 * (cx * ox + cy * oy + cz * oz) - oo + r2
            ok = det >= 0.0
            sq = jnp.sqrt(jnp.where(ok, det, 0.0))
            minus_t = b - sq
            plus_t = b + sq
            t = jnp.where(minus_t > eps, minus_t, plus_t)
            valid = ok & (t > eps)
            t = jnp.where(valid, t, _INF)
            ct = jnp.min(t, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, (SC, RT), 0)
            ci = jnp.min(
                jnp.where(t <= ct, rows, jnp.int32(2**30)), axis=0, keepdims=True
            ) + c * SC
            # sphere wins ties against the running (triangle) best, but an
            # all-inf chunk must never displace a real triangle hit
            take = (ct <= bt) & jnp.isfinite(ct)
            return jnp.where(take, ct, bt), jnp.where(
                take, ci + n_tri, bi
            )

        best_t, best_i = jax.lax.fori_loop(
            0, n_sc, sph_body, (best_t, best_i), unroll=False
        )

    t_ref[...] = best_t
    idx_ref[...] = best_i


def dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _pad_rows(a: np.ndarray | jnp.ndarray, mult: int, cols: int):
    n = a.shape[0]
    pad = (-n) % mult if n else mult
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, cols), a.dtype)], axis=0)
    return a


@functools.partial(jax.jit, static_argnames=("eps",))
def _run(tri_tab, sph_tab, n_tri, n_sph, org, dirn, eps):
    r = org.shape[1]
    t_pad = tri_tab.shape[0]
    s_pad = sph_tab.shape[0]
    grid = (r // RT,)
    kernel = functools.partial(
        _intersect_kernel,
        n_tri=n_tri,
        n_sph=n_sph,
        t_pad=t_pad,
        s_pad=s_pad,
        eps=eps,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_pad, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
    )(tri_tab, sph_tab, org, dirn)


class PackedScene:
    """Host-side packed primitive tables for the Pallas kernel."""

    def __init__(self, scene):
        tri = scene.triangles
        sph = scene.spheres
        self.n_tri = int(tri.woop.shape[0])
        self.n_sph = int(sph.centre.shape[0])
        tri_tab = tri.woop.reshape(max(self.n_tri, 1), 12) if self.n_tri else \
            jnp.zeros((0, 12), jnp.float32)
        # padding rows: all-zero woop -> d_w == 0 -> parallel-rejected
        self.tri_tab = _pad_rows(tri_tab.astype(jnp.float32), TC, 12)
        if self.n_sph:
            sph_tab = jnp.concatenate(
                [
                    sph.centre.astype(jnp.float32),
                    sph.radius_sq.astype(jnp.float32)[:, None],
                    sph.centre_sq.astype(jnp.float32)[:, None],
                    jnp.zeros((self.n_sph, 3), jnp.float32),
                ],
                axis=1,
            )
        else:
            sph_tab = jnp.zeros((0, 8), jnp.float32)
        # padding rows: centre 0, r^2 = 0, |c|^2 = +inf -> det < 0 always
        pad = (-self.n_sph) % SC
        if self.n_sph == 0:
            pad = SC
        if pad:
            bad = jnp.concatenate(
                [
                    jnp.zeros((pad, 4), jnp.float32),
                    jnp.full((pad, 1), jnp.inf, jnp.float32),
                    jnp.zeros((pad, 3), jnp.float32),
                ],
                axis=1,
            )
            sph_tab = jnp.concatenate([sph_tab, bad], axis=0)
        self.sph_tab = sph_tab


def intersect_packed(
    packed: PackedScene, org: jnp.ndarray, dirn: jnp.ndarray, eps: float
):
    """Nearest-hit query via the fused kernel.

    org/dirn: [3, R] with R a multiple of RT (caller pads).
    Returns (t [R] (+inf miss), packed_idx [R]).
    """
    t, idx = _run(
        packed.tri_tab,
        packed.sph_tab,
        packed.n_tri,
        packed.n_sph,
        org.astype(jnp.float32),
        dirn.astype(jnp.float32),
        float(eps),
    )
    return t[0], idx[0]
