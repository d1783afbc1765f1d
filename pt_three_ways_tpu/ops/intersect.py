"""Ray-scene intersection as batched matmuls + masked reductions.

TPU-first redesign of the reference's per-ray linear scans
(src/dod/Scene.cpp:13-122). Semantics match the reference exactly:

  * spheres: smallpt quadratic, ``t = minusT if minusT > eps else plusT``,
    both-behind reject, inside detection + normal flip
    (src/dod/Scene.cpp:13-49);
  * triangles: Moller-Trumbore acceptance region (u >= 0, u <= 1, v >= 0,
    u+v <= 1), parallel reject, backface flip, vertex-normal interpolation
    for the winning triangle only (src/dod/Scene.cpp:51-113);
  * combination: nearest wins; on an exact tie the sphere wins, because the
    reference passes the sphere distance as ``nearerThan`` and triangles must
    be strictly nearer (src/dod/Scene.cpp:115-122).

Layout: rays are COMPONENT-MAJOR — origins/directions are [3, R], per-pair
intermediates are [S, R] / [T, R] with the big ray batch in the minor (lane)
dimension. This keeps VPU lanes full and reductions over primitives in the
cheap sublane axis; primitive counts pad to 8 sublanes instead of rays
padding to 128 lanes (the difference between ~10 and >100 Mray/s measured).

The arithmetic is organised so the per-pair terms are matmuls:
  * spheres: c.d and c.o for all (sphere, ray) pairs are [S,3] @ [3,R];
  * triangles: each Woop-transform component is [T,4] @ [4,R]
    (models/scene.py precomputes the per-triangle affine transforms).

Triangle sets larger than ``tri_chunk`` are reduced with a ``lax.scan`` over
chunks carrying the running winner, so VMEM stays bounded for any mesh size.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gather import onehot_gather
from .vecmath import dot, normalise, safe_sqrt, vec3

INF = jnp.inf

# |w_d| below this counts as "ray parallel to triangle plane"
# (reference: fabs(det) < Epsilon, src/dod/Scene.cpp:66-67).
_PARALLEL_EPS = 1e-12


class Hits(NamedTuple):
    """SoA hit record (reference Hit + material id, src/math/Hit.h:6-11)."""

    t: jnp.ndarray  # [R] distance, +inf when miss
    hit: jnp.ndarray  # [R] bool
    pos: jnp.ndarray  # [3, R]
    normal: jnp.ndarray  # [3, R] always opposing the ray
    inside: jnp.ndarray  # [R] bool (sphere interior / triangle backface)
    mat_id: jnp.ndarray  # [R] int32


def intersect_spheres(
    orig: jnp.ndarray,  # [3, R]
    dirn: jnp.ndarray,  # [3, R]
    centre: jnp.ndarray,  # [S, 3]
    radius_sq: jnp.ndarray,  # [S]
    centre_sq: jnp.ndarray,  # [S]
    eps: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest sphere per ray. Returns (t [R] (+inf miss), index [R]).

    Quadratic solved in the matmul form:
      b   = (c - o).d        = c.d - o.d
      det = b^2 - |c - o|^2 + r^2
          = b^2 - |c|^2 + 2 c.o - |o|^2 + r^2
    where c.d and c.o are [S,3] @ [3,R] matmuls (MXU) and the rest is VPU
    work on [S, R] tiles reduced over the sublane S axis.
    """
    s = centre.shape[0]
    r = orig.shape[1]
    if s == 0:
        return jnp.full((r,), INF, orig.dtype), jnp.zeros((r,), jnp.int32)
    # Explicit FMA broadcasts instead of a K=3 matmul: bit-exact f32 (TPU
    # matmuls default to bf16, which destroys geometric precision) and the
    # MXU gains nothing from K=3 anyway.
    cx = centre[:, 0:1]
    cy = centre[:, 1:2]
    cz = centre[:, 2:3]
    cd = cx * dirn[0] + cy * dirn[1] + cz * dirn[2]  # [S, R]
    co = cx * orig[0] + cy * orig[1] + cz * orig[2]  # [S, R]
    od = dot(orig, dirn)  # [R]
    oo = dot(orig, orig)  # [R]
    b = cd - od[None, :]
    det = b * b - centre_sq[:, None] + 2.0 * co - oo[None, :] + radius_sq[:, None]
    sq = safe_sqrt(det)
    minus_t = b - sq
    plus_t = b + sq
    t = jnp.where(minus_t > eps, minus_t, plus_t)
    valid = (det >= 0.0) & (t > eps)
    t = jnp.where(valid, t, INF)
    best_t = jnp.min(t, axis=0)
    idx = jnp.argmin(t, axis=0).astype(jnp.int32)
    return best_t, idx


def _tri_block(orig, dirn, woop, eps):
    """Best triangle within one chunk. Returns (t [R], local idx [R]).

    woop: [T, 3, 4]. Six [T,4]/[T,3] @ [·,R] matmuls produce the transformed
    (u, v, w) origin/direction components as [T, R] tiles.
    """
    ox, oy, oz = orig[0], orig[1], orig[2]
    dx, dy, dz = dirn[0], dirn[1], dirn[2]

    def row(k):
        return (
            woop[:, k, 0:1],
            woop[:, k, 1:2],
            woop[:, k, 2:3],
            woop[:, k, 3:4],
        )

    # Explicit f32 FMA broadcasts (see intersect_spheres note on TPU bf16
    # matmul defaults); identical rounding to the Pallas kernel.
    u0, u1, u2, u3 = row(0)
    v0, v1, v2, v3 = row(1)
    w0, w1, w2, w3 = row(2)
    o_u = u0 * ox + u1 * oy + u2 * oz + u3  # [T, R]
    o_v = v0 * ox + v1 * oy + v2 * oz + v3
    o_w = w0 * ox + w1 * oy + w2 * oz + w3
    d_u = u0 * dx + u1 * dy + u2 * dz
    d_v = v0 * dx + v1 * dy + v2 * dz
    d_w = w0 * dx + w1 * dy + w2 * dz

    not_parallel = jnp.abs(d_w) > _PARALLEL_EPS
    safe_wd = jnp.where(not_parallel, d_w, 1.0)
    t = -o_w / safe_wd
    u = o_u + t * d_u
    v = o_v + t * d_v
    valid = (
        not_parallel
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    t = jnp.where(valid, t, INF)
    best_t = jnp.min(t, axis=0)
    idx = jnp.argmin(t, axis=0).astype(jnp.int32)
    return best_t, idx


def intersect_triangles(
    orig: jnp.ndarray,  # [3, R]
    dirn: jnp.ndarray,  # [3, R]
    woop: jnp.ndarray,  # [T, 3, 4]
    eps: float,
    tri_chunk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest triangle per ray. Returns (t [R] (+inf miss), index [R])."""
    t_count = woop.shape[0]
    r = orig.shape[1]
    if t_count == 0:
        return jnp.full((r,), INF, orig.dtype), jnp.zeros((r,), jnp.int32)
    if t_count <= tri_chunk:
        return _tri_block(orig, dirn, woop, eps)

    pad = (-t_count) % tri_chunk
    if pad:
        woop = jnp.concatenate(
            [woop, jnp.zeros((pad, 3, 4), woop.dtype)], axis=0
        )  # zero transform => w_d == 0 => parallel-rejected
    n_chunks = woop.shape[0] // tri_chunk
    chunks = woop.reshape(n_chunks, tri_chunk, 3, 4)

    def step(carry, chunk_data):
        best_t, best_idx, base = carry
        ct, ci = _tri_block(orig, dirn, chunk_data, eps)
        take = ct < best_t
        best_t = jnp.where(take, ct, best_t)
        best_idx = jnp.where(take, ci + base, best_idx)
        return (best_t, best_idx, base + tri_chunk), None

    init = (
        jnp.full((r,), INF, orig.dtype),
        jnp.zeros((r,), jnp.int32),
        jnp.int32(0),
    )
    (best_t, best_idx, _), _ = jax.lax.scan(step, init, chunks)
    return best_t, best_idx


def _triangle_shade_info(orig, dirn, t, idx, woop, normals, mat_id):
    """Recompute (u, v, w_d) for each ray's winning triangle and build the
    interpolated, backface-flipped normal (src/dod/Scene.cpp:99-113).

    The 21 winner coefficients (12 Woop + 9 vertex-normal components) plus
    the material id come from ONE one-hot matmul (ops/gather.py); per-winner
    recompute is far cheaper than carrying u/v through the chunked
    reduction, and one-hot lookups are ~100x faster than TPU gathers.
    """
    t_count = woop.shape[0]
    coef = jnp.concatenate(
        [
            woop.reshape(t_count, 12).T,  # [12, T]
            normals.reshape(t_count, 9).T,  # [9, T]
            mat_id.astype(woop.dtype)[None, :],  # [1, T]
        ],
        axis=0,
    )  # [22, T]
    c = onehot_gather(coef, idx)  # [22, R]
    ox, oy, oz = orig[0], orig[1], orig[2]
    dx, dy, dz = dirn[0], dirn[1], dirn[2]
    o_u = c[0] * ox + c[1] * oy + c[2] * oz + c[3]
    o_v = c[4] * ox + c[5] * oy + c[6] * oz + c[7]
    d_u = c[0] * dx + c[1] * dy + c[2] * dz
    d_v = c[4] * dx + c[5] * dy + c[6] * dz
    d_w = c[8] * dx + c[9] * dy + c[10] * dz
    u = o_u + t * d_u
    v = o_v + t * d_v

    n = c[12:21]  # [9, R] = (n0, n1, n2) xyz
    interp = vec3(
        n[0] + u * (n[3] - n[0]) + v * (n[6] - n[0]),
        n[1] + u * (n[4] - n[1]) + v * (n[7] - n[1]),
        n[2] + u * (n[5] - n[2]) + v * (n[8] - n[2]),
    )
    interp = normalise(interp)
    # det_MT = -w_d * |n_un|^2, backfacing iff det_MT < eps ~ w_d > 0
    backfacing = d_w > 0.0
    normal = jnp.where(backfacing, -interp, interp)
    win_mat = jnp.round(c[21]).astype(jnp.int32)
    return normal, backfacing, win_mat


def intersect_scene(
    scene,
    orig: jnp.ndarray,  # [3, R]
    dirn: jnp.ndarray,  # [3, R]
    eps: float,
    tri_chunk: int = 1024,
    backend: str = "xla",  # "xla" | "pallas" | "pallas-interpret"
    live: jnp.ndarray | None = None,  # [R] bool; None = all live
) -> Hits:
    """Nearest hit across spheres + triangles (src/dod/Scene.cpp:115-122).

    backend="pallas" routes the winner search through the fused VMEM kernel
    (ops/pallas_intersect.py); the shading-info reconstruction below is
    shared. Results agree up to f32 rounding order. ``live`` lanes that are
    False are skipped by the kernel's BVH and report a miss (callers mask
    dead wavefront lanes anyway; the kernel turns that into saved work).
    """
    sph = scene.spheres
    tri = scene.triangles
    if backend.startswith("pallas"):
        from .pallas_intersect import RT, PackedScene, intersect_packed

        r = orig.shape[1]
        pad = (-r) % RT
        if live is None:
            live = jnp.ones((r,), bool)
        if pad:
            zeros = jnp.zeros((3, pad), orig.dtype)
            org_p = jnp.concatenate([orig, zeros], axis=1)
            dir_p = jnp.concatenate([dirn, zeros], axis=1)
            live_p = jnp.concatenate([live, jnp.zeros((pad,), bool)])
        else:
            org_p, dir_p, live_p = orig, dirn, live
        packed = PackedScene(scene)
        t, pidx = intersect_packed(
            packed, org_p, dir_p, eps,
            interpret=backend.endswith("interpret"), live=live_p,
        )
        if pad:
            t = t[:r]
            pidx = pidx[:r]
        t = t.astype(orig.dtype)
        n_tri = scene.num_triangles
        tri_wins = pidx < n_tri
        i_t = jnp.where(tri_wins, pidx, 0)
        i_s = jnp.where(tri_wins, 0, pidx - n_tri)
    else:
        t_s, i_s = intersect_spheres(
            orig, dirn, sph.centre, sph.radius_sq, sph.centre_sq, eps
        )
        t_t, i_t = intersect_triangles(orig, dirn, tri.woop, eps, tri_chunk)
        # Reference: triangles must be strictly nearer than the sphere hit.
        tri_wins = t_t < t_s
        t = jnp.where(tri_wins, t_t, t_s)
        if live is not None:
            t = jnp.where(live, t, INF)
    return hits_from_winner(scene, orig, dirn, t, tri_wins, i_t, i_s)


def hits_from_winner(
    scene,
    orig: jnp.ndarray,  # [3, R]
    dirn: jnp.ndarray,  # [3, R]
    t: jnp.ndarray,  # [R] winner distance, +inf miss
    tri_wins: jnp.ndarray,  # [R] bool
    i_t: jnp.ndarray,  # [R] winning triangle index (0 when not tri)
    i_s: jnp.ndarray,  # [R] winning sphere index (0 when not sphere)
) -> Hits:
    """Differentiable Hits reconstruction from a known winner — the shared
    tail of intersect_scene, also used by the path-replay backward
    (models/replay.py) to rebuild shading inputs from SAVED (t, idx)
    without re-running the winner search."""
    sph = scene.spheres
    tri = scene.triangles
    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    pos = orig + t_safe * dirn

    has_s = scene.num_spheres > 0
    has_t = scene.num_triangles > 0

    if has_s:
        # centre + material id for the winner in one one-hot matmul
        coef_s = jnp.concatenate(
            [sph.centre.T, sph.mat_id.astype(sph.centre.dtype)[None, :]], axis=0
        )  # [4, S]
        g = onehot_gather(coef_s, i_s)
        n_sph = normalise(pos - g[0:3])
        inside_s = dot(n_sph, dirn) > 0.0
        n_sph = jnp.where(inside_s, -n_sph, n_sph)
        mat_s = jnp.round(g[3]).astype(jnp.int32)
    if has_t:
        n_tri, inside_t, mat_t = _triangle_shade_info(
            orig, dirn, t_safe, i_t, tri.woop, tri.normals, tri.mat_id
        )

    if has_s and has_t:
        normal = jnp.where(tri_wins, n_tri, n_sph)
        inside = jnp.where(tri_wins, inside_t, inside_s)
        mat_id = jnp.where(tri_wins, mat_t, mat_s)
    elif has_t:
        normal, inside, mat_id = n_tri, inside_t, mat_t
    elif has_s:
        normal, inside, mat_id = n_sph, inside_s, mat_s
    else:
        normal = jnp.zeros_like(pos)
        inside = jnp.zeros(t.shape, bool)
        mat_id = jnp.zeros(t.shape, jnp.int32)

    return Hits(t=t, hit=hit, pos=pos, normal=normal, inside=inside, mat_id=mat_id)
