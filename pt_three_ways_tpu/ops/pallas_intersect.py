"""Fused Pallas intersection kernel: nearest sphere+triangle hit per ray.

The pure-XLA intersector (ops/intersect.py) streams [T, R]/[S, R]
intermediates through HBM; this kernel keeps the whole primitive table and
all per-pair intermediates in VMEM, reading only the ray tile and writing
only (t, packed index) — the memory-traffic-optimal form of the reference's
linear scan (src/dod/Scene.cpp:13-122), with identical semantics (including
the sphere-wins-ties rule and the minusT/plusT epsilon logic).

Acceleration (the BVH the reference never had, README.md:5-6): triangles are
Morton-ordered at scene build (models/scene.py), so each TC-triangle chunk
is spatially compact. A two-level wide BVH sits on top:

  * leaves: TC-triangle chunks with AABBs, slab-tested against the whole ray
    tile; a chunk's Moller-Trumbore math runs only when some LIVE ray in the
    tile could improve its current best inside the box;
  * L1 nodes: FAN consecutive leaves per node with their union AABB; a
    failed L1 test skips all FAN leaf tests at once.

Ray tiles are pixel-/path-coherent, so whole subtrees are skipped per tile —
the TPU-shaped equivalent of per-ray BVH traversal (which would serialise
into gathers here). This is exact, not approximate: the tests are
conservative and only prune work that cannot change any winner.

Wavefront liveness: the kernel takes a per-lane ``live`` mask. Dead lanes
seed ``best_t = -inf`` so they can never drive chunk loads through the slab
test, and a tile whose lanes are ALL dead skips the entire primitive loop —
in open scenes most of the frame dies after the first bounce and those tiles
cost nothing (the reference's early-out philosophy, dod/Scene.cpp:76-90,
promoted to whole-tile granularity).

Packed index convention: triangles are [0, T), spheres are [T, T+S).

Grid: 1D over ray tiles (RT lanes each). Primitive tables are broadcast to
every program (they are small: 12 f32/triangle + 8 f32/box, 8 f32/sphere)
and looped in sublane chunks of TC/SC inside the kernel, so arbitrary scene
sizes fit.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rays per program (lanes). 1024 is the measured optimum on v5e for the
# regen megakernel (smaller tiles cut per-tile divergence waste but pay
# the broadcast scene-table load more often); env-overridable for A/B
# sweeps (must stay a multiple of 128 — the f32 lane tile).
RT = int(os.environ.get("PT3_RT", "1024"))
if RT % 128 != 0 or RT <= 0:
    raise ValueError(f"PT3_RT must be a positive multiple of 128, got {RT}")
TC = 64  # triangles per inner chunk (sublanes) == BVH leaf size
SC = 64  # spheres per inner chunk
FAN = 8  # leaves per L1 node (wide-BVH branching factor)

_PARALLEL_EPS = 1e-12
_INF = float("inf")
_BIG = 2**30


def _slab_test(box, ox, oy, oz, idx_, idy, idz, best_t, eps):
    """Conservative ray/AABB test for one box vs the whole tile.

    box: [1, 8] (lox loy loz hix hiy hiz pad pad); id* are precomputed
    1/direction components [RT]. Returns scalar "any LIVE ray can improve"
    (dead lanes carry best_t == -inf and can never pass)."""
    t0x = (box[0, 0] - ox) * idx_
    t1x = (box[0, 3] - ox) * idx_
    t0y = (box[0, 1] - oy) * idy
    t1y = (box[0, 4] - oy) * idy
    t0z = (box[0, 2] - oz) * idz
    t1z = (box[0, 5] - oz) * idz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    useful = (tmax >= jnp.maximum(tmin, eps)) & (tmin < best_t[0, :])
    return jnp.any(useful)


def intersect_tile(
    tri_ref,  # [Tpad, 12] VMEM: woop rows (u,v,w) x (cx,cy,cz,c1)
    box_ref,  # [Tpad/TC, 8] VMEM: per-leaf AABB (lo3, hi3, pad2)
    box1_ref,  # [ceil(C/FAN), 8] VMEM: per-L1-node AABB
    sph_ref,  # [Spad, 8] VMEM: cx, cy, cz, r^2, |c|^2, pad, pad, pad
    ox, oy, oz, dx, dy, dz,  # [RT] ray components
    live,  # [RT] bool
    best_t_ref,  # [1, RT] VMEM scratch (out: winner t, -inf for dead lanes)
    best_i_ref,  # [1, RT] VMEM scratch int32 (out: packed winner index)
    *,
    n_tri: int,
    n_sph: int,
    t_pad: int,
    s_pad: int,
    eps: float,
    cull: bool,
    guard_live: bool = True,
    packed_winner: bool = False,
    skip_tris: bool = False,
):
    """Shared tile-intersection body: nearest sphere/triangle winner into
    the (best_t, best_i) scratch refs. Used by the standalone intersection
    kernel below and by the fused bounce megakernel
    (ops/pallas_megakernel.py).

    ``guard_live=False`` skips the whole-tile ``any(live)`` early-out: the
    regen kernels' while-loop cond already guarantees a live lane, so the
    vector->scalar reduction there is pure per-iteration cost.

    ``packed_winner``: fold the triangle winner's row index into the low 6
    mantissa bits of the t bitcast so ONE min reduction finds (t, index)
    per chunk instead of two. Quantises the winner t down by up to 63 ulp
    (~2^-18 relative) and may flip near-tie winners — used ONLY by the
    krng regen kernel, whose stream is gated statistically; the table-mode
    and standalone kernels keep the exact two-reduction form (bit parity
    with the XLA wavefront and its autodiff).

    ``skip_tris``: run only the init + sphere pass (keeping the real
    ``n_tri`` for the packed sphere-index offset) — the streaming
    megakernel handles triangles itself from HBM windows."""
    # dead lanes start at -inf: no chunk test and no primitive can win there
    best_t_ref[...] = jnp.where(live, _INF, -_INF).reshape(1, RT)
    best_i_ref[...] = jnp.zeros((1, RT), jnp.int32)

    # small tables are padded to 8 sublanes, not a full TC/SC chunk
    # (PackedScene): a 1-sphere scene loops 8 rows, not 64
    tc = t_pad if t_pad < TC else TC
    sc = s_pad if s_pad < SC else SC

    def _tile_body():
        # --- spheres FIRST: exactly the reference's nearerThan scheme
        # (dod/Scene.cpp:115-122 — sphere distance seeds the triangle search
        # and triangles must be STRICTLY nearer, so ties go to the sphere).
        # Seeding best_t with sphere hits also powers the chunk culling
        # below: an enclosing/backdrop sphere caps every ray's search
        # distance. ---
        if n_sph > 0:
            od = ox * dx + oy * dy + oz * dz
            oo = ox * ox + oy * oy + oz * oz
            n_sc = s_pad // sc

            def sph_body(c, _):
                sp = sph_ref[pl.ds(c * sc, sc), :]  # [sc, 8]
                cx = sp[:, 0:1]
                cy = sp[:, 1:2]
                cz = sp[:, 2:3]
                b = cx * dx + cy * dy + cz * dz - od
                det = (
                    b * b
                    - sp[:, 4:5]
                    + 2.0 * (cx * ox + cy * oy + cz * oz)
                    - oo
                    + sp[:, 3:4]
                )
                ok = det >= 0.0
                sq = jnp.sqrt(jnp.where(ok, det, 0.0))
                minus_t = b - sq
                plus_t = b + sq
                t = jnp.where(minus_t > eps, minus_t, plus_t)
                valid = ok & (t > eps)
                t = jnp.where(valid, t, _INF)
                ct = jnp.min(t, axis=0, keepdims=True)
                rows = jax.lax.broadcasted_iota(jnp.int32, (sc, RT), 0)
                ci = jnp.min(
                    jnp.where(t <= ct, rows, _BIG), axis=0, keepdims=True
                ) + c * sc
                take = ct < best_t_ref[...]
                best_i_ref[...] = jnp.where(take, ci + n_tri, best_i_ref[...])
                best_t_ref[...] = jnp.where(take, ct, best_t_ref[...])
                return 0

            jax.lax.fori_loop(0, n_sc, sph_body, 0)

        # --- triangles: Morton-ordered chunks under a 2-level wide BVH ---
        if n_tri > 0 and not skip_tris:
            if cull:
                safe = lambda d: jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
                idx_d = 1.0 / safe(dx)
                idy_d = 1.0 / safe(dy)
                idz_d = 1.0 / safe(dz)
            n_tc = t_pad // tc

            def tri_chunk(c):
                w = tri_ref[pl.ds(c * tc, tc), :]  # [tc, 12]
                o_u = w[:, 0:1] * ox + w[:, 1:2] * oy + w[:, 2:3] * oz + w[:, 3:4]
                o_v = w[:, 4:5] * ox + w[:, 5:6] * oy + w[:, 6:7] * oz + w[:, 7:8]
                o_w = w[:, 8:9] * ox + w[:, 9:10] * oy + w[:, 10:11] * oz + w[:, 11:12]
                d_u = w[:, 0:1] * dx + w[:, 1:2] * dy + w[:, 2:3] * dz
                d_v = w[:, 4:5] * dx + w[:, 5:6] * dy + w[:, 6:7] * dz
                d_w = w[:, 8:9] * dx + w[:, 9:10] * dy + w[:, 10:11] * dz
                not_par = jnp.abs(d_w) > _PARALLEL_EPS
                # divide is the single most expensive op in the chunk body;
                # hardware approx reciprocal + one Newton step (~full f32
                # accuracy: e0^2 residual) measured faster on v5e
                den = jnp.where(not_par, d_w, 1.0)
                rcp = pl.reciprocal(den, approx=True)
                rcp = rcp * (2.0 - den * rcp)
                t = -o_w * rcp
                u = o_u + t * d_u
                v = o_v + t * d_v
                # u <= 1 is implied by v >= 0 and u + v <= 1 (exact same
                # accept set, two fewer [tc, RT] ops in the hottest loop)
                valid = (
                    not_par
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > eps)
                )
                t = jnp.where(valid, t, _INF)
                rows = jax.lax.broadcasted_iota(jnp.int32, (tc, RT), 0)
                if packed_winner:
                    # one reduction: row id rides the low 6 mantissa bits
                    # (tc <= 64). t > eps > 0 and +inf both bitcast to
                    # positive int32 whose order matches float order.
                    tb = jax.lax.bitcast_convert_type(t, jnp.int32)
                    packed = (tb & ~jnp.int32(63)) | rows
                    cp = jnp.min(packed, axis=0, keepdims=True)
                    ct = jax.lax.bitcast_convert_type(
                        cp & ~jnp.int32(63), jnp.float32
                    )
                    ci = (cp & jnp.int32(63)) + c * tc
                else:
                    # two exact reductions: bit parity with the XLA
                    # wavefront and its autodiff (near-tie winners must
                    # not flip — the packed form quantises t by 63 ulp)
                    ct = jnp.min(t, axis=0, keepdims=True)  # [1, RT]
                    ci = jnp.min(
                        jnp.where(t <= ct, rows, _BIG), axis=0, keepdims=True
                    ) + c * tc
                take = ct < best_t_ref[...]
                best_i_ref[...] = jnp.where(take, ci, best_i_ref[...])
                best_t_ref[...] = jnp.where(take, ct, best_t_ref[...])

            if cull:
                n_l1 = -(-n_tc // FAN)

                def l1_body(n, _):
                    node = box1_ref[pl.ds(n, 1), :]
                    node_wanted = _slab_test(
                        node, ox, oy, oz, idx_d, idy_d, idz_d,
                        best_t_ref[...], eps,
                    )

                    @pl.when(node_wanted)
                    def _():
                        def leaf_body(j, _):
                            c = n * FAN + j
                            box = box_ref[pl.ds(c, 1), :]
                            wanted = _slab_test(
                                box, ox, oy, oz, idx_d, idy_d, idz_d,
                                best_t_ref[...], eps,
                            )

                            @pl.when(wanted)
                            def _():
                                tri_chunk(c)

                            return 0

                        # clamp the last node's fan-out to the real leaves
                        jax.lax.fori_loop(
                            0, jnp.minimum(FAN, n_tc - n * FAN), leaf_body, 0
                        )

                    return 0

                jax.lax.fori_loop(0, n_l1, l1_body, 0)
            else:
                def tri_body(c, _):
                    tri_chunk(c)
                    return 0

                jax.lax.fori_loop(0, n_tc, tri_body, 0)

    if guard_live:
        pl.when(jnp.any(live))(_tile_body)
    else:
        _tile_body()


def _intersect_kernel(
    tri_ref, box_ref, box1_ref, sph_ref,
    org_ref,  # [3, RT] VMEM
    dir_ref,  # [3, RT] VMEM
    live_ref,  # [1, RT] VMEM f32: 1.0 live, 0.0 dead
    t_ref,  # [1, RT] out
    idx_ref,  # [1, RT] out int32
    best_t_ref,  # [1, RT] VMEM scratch
    best_i_ref,  # [1, RT] VMEM scratch int32
    *,
    n_tri: int,
    n_sph: int,
    t_pad: int,
    s_pad: int,
    eps: float,
    cull: bool,
):
    live = live_ref[0, :] != 0.0
    intersect_tile(
        tri_ref, box_ref, box1_ref, sph_ref,
        org_ref[0, :], org_ref[1, :], org_ref[2, :],
        dir_ref[0, :], dir_ref[1, :], dir_ref[2, :],
        live, best_t_ref, best_i_ref,
        n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
        eps=eps, cull=cull,
    )
    # dead lanes report a miss (+inf), not their -inf sentinel
    t_ref[...] = jnp.where(live, best_t_ref[0, :], _INF).reshape(1, RT)
    idx_ref[...] = best_i_ref[...]


def _pad_rows(a, mult: int, cols: int):
    n = a.shape[0]
    pad = (-n) % mult if n else mult
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, cols), a.dtype)], axis=0)
    return a


@functools.partial(
    jax.jit, static_argnames=("eps", "n_tri", "n_sph", "cull", "interpret")
)
def _run(tri_tab, box_tab, box1_tab, sph_tab, n_tri, n_sph, org, dirn, live,
         eps, cull, interpret=False):
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
        cull=cull,
    )
    n_boxes = box_tab.shape[0]
    n_boxes1 = box1_tab.shape[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_pad, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_boxes, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_boxes1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RT), jnp.float32),
            pltpu.VMEM((1, RT), jnp.int32),
        ],
        interpret=interpret,
    )(tri_tab, box_tab, box1_tab, sph_tab, org, dirn, live)


class PackedScene:
    """Host-side packed primitive tables for the Pallas kernel."""

    def __init__(self, scene):
        tri = scene.triangles
        sph = scene.spheres
        self.n_tri = int(tri.woop.shape[0])
        self.n_sph = int(sph.centre.shape[0])
        tri_tab = (
            tri.woop.reshape(self.n_tri, 12)
            if self.n_tri
            else jnp.zeros((0, 12), jnp.float32)
        )
        # padding rows: all-zero woop -> d_w == 0 -> parallel-rejected.
        # Pad to TC only (NOT a full L1 node: that would multiply the chunk
        # loop for small scenes); the kernel's leaf loop clamps the last L1
        # node's fan-out instead. Sub-chunk scenes pad to the 8-sublane
        # granularity so e.g. cornell's 38 triangles loop 40 rows, not 64
        # (intersect_tile shrinks its chunk size to match).
        t_mult = TC if self.n_tri > TC else 8
        self.tri_tab = _pad_rows(tri_tab.astype(jnp.float32), t_mult, 12)

        # per-chunk AABBs over the (Morton-ordered) triangle verts; padding
        # rows collapse to an empty box at the last real vertex, which can
        # never beat a real hit
        if self.n_tri:
            verts = tri.verts.astype(jnp.float32)  # [T, 3, 3]
            pad = self.tri_tab.shape[0] - self.n_tri
            if pad:
                verts = jnp.concatenate(
                    [verts, jnp.broadcast_to(verts[-1:, -1:, :], (pad, 3, 3))],
                    axis=0,
                )
            chunk = min(TC, self.tri_tab.shape[0])
            n_chunks = verts.shape[0] // chunk
            v = verts.reshape(n_chunks, chunk * 3, 3)
            lo = v.min(axis=1)  # [C, 3]
            hi = v.max(axis=1)
            self.box_tab = jnp.concatenate(
                [lo, hi, jnp.zeros((n_chunks, 2), jnp.float32)], axis=1
            )
            # L1 nodes: union of up to FAN consecutive leaf boxes (partial
            # last node: pad the union reduction with empty boxes)
            n_l1 = -(-n_chunks // FAN)
            pad1 = n_l1 * FAN - n_chunks
            lo_p = jnp.concatenate(
                [lo, jnp.full((pad1, 3), jnp.inf, jnp.float32)], axis=0
            )
            hi_p = jnp.concatenate(
                [hi, jnp.full((pad1, 3), -jnp.inf, jnp.float32)], axis=0
            )
            lo1 = lo_p.reshape(n_l1, FAN, 3).min(axis=1)
            hi1 = hi_p.reshape(n_l1, FAN, 3).max(axis=1)
            self.box1_tab = jnp.concatenate(
                [lo1, hi1, jnp.zeros((n_l1, 2), jnp.float32)], axis=1
            )
        else:
            self.box_tab = jnp.zeros((1, 8), jnp.float32)
            self.box1_tab = jnp.zeros((1, 8), jnp.float32)

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
        # padding rows: centre 0, r^2 = 0, |c|^2 = +inf -> det < 0 always;
        # sub-chunk sphere sets pad to 8 sublanes (1-sphere scenes loop 8
        # rows, not SC=64)
        s_mult = SC if self.n_sph > SC else 8
        pad = (-self.n_sph) % s_mult
        if self.n_sph == 0:
            pad = s_mult
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _kernel_tx(tabs, org, live, n_tri, n_sph, eps, cull, interpret):
    tri_tab, box_tab, box1_tab, sph_tab = tabs
    orig, dirn = org
    t, idx = _run(
        tri_tab, box_tab, box1_tab, sph_tab, n_tri, n_sph, orig, dirn, live,
        eps, cull, interpret
    )
    return t[0], idx[0]


def _kernel_tx_fwd(tabs, org, live, n_tri, n_sph, eps, cull, interpret):
    t, idx = _kernel_tx(tabs, org, live, n_tri, n_sph, eps, cull, interpret)
    return (t, idx), (tabs, org, t, idx)


def _kernel_tx_bwd(n_tri, n_sph, eps, cull, interpret, res, cotangents):
    """Analytic dt via the implicit function theorem.

    For the winning primitive with (unnormalised) geometric normal g at the
    hit:  dt/d_org = -g / (g . d),  dt/d_dir = -t g / (g . d)
    (sphere: g = x - c; triangle: g = the Woop w-row, parallel to the face
    normal). Matches the XLA path's autodiff (winner index detached).
    Scene-table and live-mask cotangents are zero — geometry and liveness
    are detached by design.
    """
    from .gather import onehot_gather

    tabs, (orig, dirn), t, idx = res
    tri_tab, box_tab, box1_tab, sph_tab = tabs
    t_bar, _ = cotangents

    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    tb = jnp.where(hit, t_bar, 0.0)

    tri_win = (idx < n_tri) & hit
    i_t = jnp.where(tri_win, idx, 0)
    i_s = jnp.where(tri_win | ~hit, 0, idx - n_tri)

    # triangle winner: g = woop w-row (coeffs 8..10)
    if n_tri > 0:
        g_tri = onehot_gather(tri_tab[:, 8:11].T, i_t)  # [3, R]
    else:
        g_tri = jnp.zeros((3,) + t.shape, orig.dtype)
    # sphere winner: g = x - c
    if n_sph > 0:
        c = onehot_gather(sph_tab[:, 0:3].T, i_s)  # [3, R]
        x = orig + t_safe * dirn
        g_sph = x - c
    else:
        g_sph = jnp.zeros((3,) + t.shape, orig.dtype)
    g = jnp.where(tri_win, g_tri, g_sph)

    gd = g[0] * dirn[0] + g[1] * dirn[1] + g[2] * dirn[2]
    inv = jnp.where(jnp.abs(gd) > 1e-20, 1.0 / jnp.where(gd == 0, 1.0, gd), 0.0)
    scale = jnp.where(hit, -tb * inv, 0.0)
    d_org = g * scale
    d_dir = g * (scale * t_safe)
    zeros_tabs = jax.tree.map(jnp.zeros_like, tabs)
    zeros_live = jnp.zeros((1, orig.shape[1]), jnp.float32)
    return (zeros_tabs, (d_org, d_dir), zeros_live)


_kernel_tx.defvjp(_kernel_tx_fwd, _kernel_tx_bwd)


def intersect_packed(
    packed: PackedScene,
    org: jnp.ndarray,
    dirn: jnp.ndarray,
    eps: float,
    interpret: bool = False,
    cull: bool = True,
    live: jnp.ndarray | None = None,
):
    """Nearest-hit query via the fused kernel (differentiable: see
    _kernel_tx_bwd for the analytic ray-derivative of t).

    org/dirn: [3, R] with R a multiple of RT (caller pads). ``live``: [R]
    bool (or f32 0/1); lanes that are not live are skipped by the BVH and
    report a miss. Returns (t [R] (+inf miss), packed_idx [R]).
    """
    r = org.shape[1]
    if live is None:
        live_f = jnp.ones((1, r), jnp.float32)
    else:
        live_f = live.astype(jnp.float32).reshape(1, r)
    # culling only pays once there are several nodes to skip
    do_cull = cull and packed.n_tri > 2 * TC
    return _kernel_tx(
        (packed.tri_tab, packed.box_tab, packed.box1_tab, packed.sph_tab),
        (org.astype(jnp.float32), dirn.astype(jnp.float32)),
        live_f,
        packed.n_tri,
        packed.n_sph,
        float(eps),
        do_cull,
        interpret,
    )
