"""Fused multi-bounce megakernel: the whole wavefront bounce loop in VMEM.

The wavefront integrator (models/integrator.py) dispatches per bounce:
intersect kernel -> winner one-hot gathers -> material lookups -> Fresnel ->
direction sampling -> state updates, each stage streaming [*, N] arrays
through HBM. This kernel runs ALL bounces of a ray tile in one Pallas
program: path state (org, dir, beta, acc, alive) lives in VMEM/registers for
the entire depth chain, primitive+material tables are VMEM-resident, and the
only HBM traffic is the initial state in, the per-bounce uniforms in
(12 B/lane/bounce, precomputed outside so RNG streams match the unfused
path), and the accumulated radiance out.

Per-bounce semantics are identical to models/integrator.bounce (reference:
src/dod/Scene.cpp:124-179, src/oo/Material.cpp:25-67):

  * nearest hit via the shared BVH tile intersector
    (ops/pallas_intersect.intersect_tile — spheres first, strict-< triangle
    rule, live-lane skipping);
  * winner attributes (woop rows, vertex normals, per-primitive material
    row) via EXACT bf16x3 one-hot matmuls on the MXU, block-skipped when a
    table block holds no winners;
  * emission/environment accumulation, Fresnel-or-fixed reflectivity event
    choice, cone-vs-hemisphere sampling, zero-throughput kill.

This is the fast FORWARD path (CLI/bench). It is not differentiable; the
training path keeps the unfused lax.scan wavefront whose custom-VJP
intersector and path-replay remat provide gradients (parallel/train.py sets
RenderParams.fused="off").
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_intersect import (
    FAN,
    RT,
    SC,
    TC,
    PackedScene,
    _pad_rows,
    _slab_test,
    intersect_tile,
)

# Slope profiling (timing-only): duplicate the intersect stage inside every
# fused kernel iteration; the bench delta vs baseline is that stage's cost.
# intersect_tile fully reinitialises its output refs, so results are
# bit-identical.
_SLOPE_DUP_INTERSECT = os.environ.get("PT3_SLOPE_DUP") == "intersect"
_SLOPE_DUP_REFILL = os.environ.get("PT3_SLOPE_DUP") == "refill"
# _gather zero-inits its output then accumulates, so a second call with the
# same selector is bit-identical — the bench delta is the gather stage cost
_SLOPE_DUP_GATHER = os.environ.get("PT3_SLOPE_DUP") == "gather"
# duplicate the whole shade tail into dummy scratch refs (krng kernel only):
# runs BEFORE the real call, writes nowhere the real call reads first, so
# results are bit-identical — the bench delta is the full shade-tail cost
_SLOPE_DUP_SHADE = os.environ.get("PT3_SLOPE_DUP") == "shade"
# duplicate the refill INCLUDING its block-copy loop into dummy refs (the
# plain "refill" probe's second call zero-trips the copy loop, measuring
# only the next-alive scan)
_SLOPE_DUP_REFILLCOPY = os.environ.get("PT3_SLOPE_DUP") == "refillcopy"
# duplicate the in-kernel uniform draws (pure function of scratch state)
_SLOPE_DUP_KRNG = os.environ.get("PT3_SLOPE_DUP") == "krng"

# The krng kernel's shade/refill bodies run UNCONDITIONALLY: both are fully
# masked (exact with zero hits/refills), and the any(hit)/any(want) guard
# reductions measured as pure cost — suzanne 28.2 -> 27.7 ms/pass with no
# ce regression (3.94 both ways, round-4 A/B). PT3_GUARDS=1 restores them.
_NO_GUARDS = os.environ.get("PT3_GUARDS", "") != "1"

# Bounces per while-loop iteration in the krng regen kernel (exact at any
# value; amortises per-iteration fixed cost — see VALIDATION.md slope
# profile). Env-overridable for A/B sweeps.
_STREAM_NO_CAPTURE = os.environ.get("PT3_STREAM_NO_CAPTURE") == "1"
_UNROLL = int(os.environ.get("PT3_UNROLL", "1"))
if _UNROLL < 1:
    raise ValueError(f"PT3_UNROLL must be >= 1, got {_UNROLL}")

# Max fused sample passes per krng regen dispatch: the per-lane alive
# bitmask is two 32-bit words (amask_lo/amask_hi). render()/shard.py
# import this so their passes-per-dispatch clamp can't drift from the
# kernel's actual capacity.
S_COUNT_MAX = 64

TB = 512  # table block (columns) per one-hot gather matmul

# Rows per path-replay residual slot (regen replay forward): 9 input-state
# rows (org/dir/beta) + winner t + packed idx + sample + depth, padded to
# 16 so every slot write/read is a 16-aligned sublane slice.
RRES = 16
_INF = float("inf")
EPSILON = 1e-9  # reference Epsilon (cone mirror early-out, Samples.cpp:9)

# tri_coef row layout ([TA, Tp]): 12 woop + 9 vertex normals + 3 emission +
# 3 diffuse + ior + reflectivity + cone = 29 -> pad 32
TA = 32
# sph_coef row layout ([SA, Sp]): 3 centre + 3 emission + 3 diffuse + ior +
# reflectivity + cone = 12 -> pad 16
SA = 16


def _bf16x3(x: jnp.ndarray):
    """Exact 3-term bf16 decomposition of f32 (hi + mid + lo == x)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


# VMEM budget for the broadcast scene tables (v5e: 16 MiB scoped VMEM per
# kernel, minus the ray-tile state/accumulator/scratch blocks and Mosaic
# headroom). Scenes whose tables exceed the relevant estimate fall back one
# tier: megakernel -> per-bounce Pallas intersect -> XLA chunked scan
# (unbounded N, like the reference's linear loop,
# src/dod/Scene.cpp:51-113). Empirically validated on subdivided suzanne
# (-subN scenes): suzanne-sub2 (15.5k tris, ~11.3 MiB) compiles and runs;
# the Mosaic OOM report for sub3's intersect kernel (30.86M requested vs
# the 16.00M limit) matches this model exactly. See VALIDATION.md round 3.
SCENE_VMEM_BUDGET_BYTES = 12 << 20


def _tiled_bytes(rows: int, cols: int, itemsize: int = 4) -> int:
    """VMEM footprint of a [rows, cols] block under the TPU's native
    (8, 128)-f32 / (16, 128)-bf16 tiling: the LANE (minor) dim pads to 128,
    the sublane dim to 8 (f32) or 16 (bf16). A narrow [T, 12] f32 table
    therefore costs 512 B per row, not 48 — the 10.7x that made the naive
    estimate miss the real Mosaic ceiling."""
    sub = 8 if itemsize == 4 else 16
    return (-(-rows // sub) * sub) * (-(-cols // 128) * 128) * itemsize


def scene_table_bytes(n_tri: int, n_sph: int, fused: bool = True) -> int:
    """Bytes of VMEM the broadcast scene tables occupy per program, under
    the native VMEM tiling (_tiled_bytes).

    Mirrors the padding rules of PackedScene (tri_tab/box tables/sph_tab)
    plus, for ``fused``, PackedSceneFused's bf16x3 attribute tables used by
    the megakernel's winner gathers.
    """
    t_mult = TC if n_tri > TC else 8
    t_pad = max(-(-max(n_tri, 1) // t_mult) * t_mult, t_mult)
    s_mult = SC if n_sph > SC else 8
    s_pad = max(-(-max(n_sph, 1) // s_mult) * s_mult, s_mult)
    chunk = min(TC, t_pad)
    n_chunks = max(t_pad // chunk, 1)
    n_l1 = -(-n_chunks // FAN)
    total = (
        _tiled_bytes(t_pad, 12)
        + _tiled_bytes(n_chunks, 8)
        + _tiled_bytes(n_l1, 8)
        + _tiled_bytes(s_pad, 8)
    )
    if fused:
        tp_pad = -(-max(t_pad, 1) // TB) * TB
        sp_pad = -(-s_pad // SC) * SC
        total += 3 * _tiled_bytes(TA, tp_pad, 2) + 3 * _tiled_bytes(
            SA, sp_pad, 2
        )
    return total


def scene_fits_pallas(scene, fused: bool = True) -> bool:
    """True when the scene's broadcast tables fit the per-program VMEM
    budget for the fused megakernel (``fused=True``) or the intersect-only
    kernel (``fused=False`` — 48 B/tri, ~5x further)."""
    n_tri = int(scene.triangles.woop.shape[0])
    n_sph = int(scene.spheres.centre.shape[0])
    return scene_table_bytes(n_tri, n_sph, fused) <= SCENE_VMEM_BUDGET_BYTES


class PackedSceneFused(PackedScene):
    """PackedScene + transposed attribute/material tables for the in-kernel
    winner gathers (bf16x3 split for exact MXU one-hot products).

    jnp-only so it can be constructed under jit (the tables are
    scene-constant, so XLA hoists the assembly out of pass loops)."""

    def __init__(self, scene):
        super().__init__(scene)
        mats = scene.materials
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        # Static no-glossy specialisation: when every material's cone angle
        # is below EPSILON the cone sampler's mirror early-out is the only
        # reachable branch, so the kernels skip the cone trig/ONB block and
        # the acos uniform transform entirely (suzanne/ce-class scenes).
        # Under jit tracing the materials are tracers — specialisation is
        # then skipped (correct either way, just slower).
        if isinstance(mats.cone_angle, jax.core.Tracer):
            self.no_glossy = False
        else:
            import numpy as _np

            cone = _np.asarray(mats.cone_angle)
            self.no_glossy = bool(cone.size == 0 or float(cone.max()) < EPSILON)

        def mat_rows(mid):
            """Per-primitive material row block [9, P] for material ids."""
            take = lambda a: jnp.take(f32(a), mid, axis=0)
            return jnp.concatenate(
                [
                    take(mats.emission).T,  # [3, P]
                    take(mats.diffuse).T,  # [3, P]
                    take(mats.ior)[None, :],
                    take(mats.reflectivity)[None, :],
                    take(mats.cone_angle)[None, :],
                ],
                axis=0,
            )

        def pad_cols(a, rows, cols):
            out = jnp.zeros((rows, cols), jnp.float32)
            return out.at[: a.shape[0], : a.shape[1]].set(a)

        tp_pad = -(-max(self.tri_tab.shape[0], 1) // TB) * TB
        if self.n_tri:
            tri = scene.triangles
            body = jnp.concatenate(
                [
                    f32(tri.woop).reshape(self.n_tri, 12).T,  # [12, T]
                    f32(tri.normals).reshape(self.n_tri, 9).T,  # [9, T]
                    mat_rows(tri.mat_id),  # [9, T]
                ],
                axis=0,
            )  # [30, T]
            tri_coef = pad_cols(body, TA, tp_pad)
        else:
            tri_coef = jnp.zeros((TA, tp_pad), jnp.float32)
        self.tri_coef = _bf16x3(tri_coef)
        self.tri_coef_pad = tp_pad

        sp_pad = -(-self.sph_tab.shape[0] // SC) * SC
        if self.n_sph:
            sph = scene.spheres
            body = jnp.concatenate(
                [f32(sph.centre).T, mat_rows(sph.mat_id)], axis=0
            )  # [12, S]
            sph_coef = pad_cols(body, SA, sp_pad)
        else:
            sph_coef = jnp.zeros((SA, sp_pad), jnp.float32)
        self.sph_coef = _bf16x3(sph_coef)
        self.sph_coef_pad = sp_pad


# Triangles per streamed VMEM window: the DMA granularity of the streaming
# megakernel (window = [WSTREAM, 32] f32 = 256 KB of HBM traffic, ~1 MB in
# VMEM under the 128-lane tile). Compute per window dwarfs the DMA
# (~45 us vs ~0.5 us at RT=1024), so the fetch is synchronous.
WSTREAM = int(os.environ.get("PT3_WSTREAM", "2048"))
if WSTREAM % TC or WSTREAM % TB:
    raise ValueError(
        f"PT3_WSTREAM must be a multiple of TC ({TC}) and TB ({TB}), got "
        f"{WSTREAM}: the window scan and winner-capture loops would "
        "silently drop tail rows"
    )


class PackedSceneStream(PackedSceneFused):
    """PackedSceneFused + an HBM-resident combined per-triangle table and
    per-window AABBs for the STREAMING megakernel (scenes whose broadcast
    VMEM tables exceed the budget — the >15k-triangle tier).

    ``tri_all`` column r equals the resident kernel's tri_coef ROW r
    (woop 0:12, vertex normals 12:21, material 21:30), so the streaming
    kernel's in-loop winner CAPTURE (bf16x3 one-hot dot over the resident
    window) produces bit-identical attribute rows to the resident kernel's
    post-intersect gather. ``wbox`` holds one conservative AABB per
    WSTREAM-triangle window over the Morton-ordered geometry — the
    window-skip test that makes coherent tiles sub-linear in T."""

    def __init__(self, scene):
        super().__init__(scene)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        t_padW = max(-(-max(self.n_tri, 1) // WSTREAM) * WSTREAM, WSTREAM)
        # 128 columns: Mosaic DMA slices must be 128-lane aligned, so the
        # 30 used columns ride in a 128-wide row (HBM cost 512 B/tri; the
        # extra DMA traffic is noise next to the per-window compute)
        tri_all = jnp.zeros((t_padW, 128), jnp.float32)
        if self.n_tri:
            tri = scene.triangles
            mats = scene.materials
            take = lambda a: jnp.take(f32(a), tri.mat_id, axis=0)
            body = jnp.concatenate(
                [
                    f32(tri.woop).reshape(self.n_tri, 12),
                    f32(tri.normals).reshape(self.n_tri, 9),
                    take(mats.emission),
                    take(mats.diffuse),
                    take(mats.ior)[:, None],
                    take(mats.reflectivity)[:, None],
                    take(mats.cone_angle)[:, None],
                ],
                axis=1,
            )  # [T, 30]
            tri_all = tri_all.at[: self.n_tri, :30].set(body)
        # padding rows keep all-zero woop -> d_w == 0 -> parallel-rejected
        self.tri_all = tri_all
        self.tri_all_pad = t_padW
        n_win = t_padW // WSTREAM
        if self.n_tri:
            verts = scene.triangles.verts.astype(jnp.float32)  # [T, 3, 3]
            pad = t_padW - self.n_tri
            if pad:
                verts = jnp.concatenate(
                    [verts, jnp.broadcast_to(verts[-1:, -1:, :], (pad, 3, 3))],
                    axis=0,
                )
            v = verts.reshape(n_win, WSTREAM * 3, 3)
            lo = v.min(axis=1)
            hi = v.max(axis=1)
        else:
            lo = jnp.full((n_win, 3), jnp.inf, jnp.float32)
            hi = jnp.full((n_win, 3), -jnp.inf, jnp.float32)
        wbox = jnp.concatenate(
            [lo, hi, jnp.zeros((n_win, 2), jnp.float32)], axis=1
        )
        self.wbox = _pad_rows(wbox, 8, 8)
        self.n_windows = n_win


def _stream_tri(
    tri_hbm_ref,  # [TpadW, 128] ANY/HBM: combined per-triangle table
    #               (columns 0:30 used — see PackedSceneStream)
    wbox_ref,  # [n_win_pad, 8] VMEM: per-window AABBs
    win0_ref,  # [WSTREAM, 128] VMEM scratch: ping window buffer
    win1_ref,  # [WSTREAM, 128] VMEM scratch: pong window buffer
    sem0,  # DMA semaphore for win0
    sem1,  # DMA semaphore for win1
    ox, oy, oz, dx, dy, dz,  # [RT] rays
    best_t_ref, best_i_ref, attr_ref,
    *,
    n_windows: int,
    eps: float,
):
    """Streamed triangle pass of the megakernel's intersect: windows of
    WSTREAM triangles are slab-tested against the whole tile (skipped
    windows cost one AABB test and NO DMA), fetched HBM->VMEM, and scanned
    in TC-row chunks with the same Woop math and packed winner select as
    the resident kernel (pallas_intersect.intersect_tile). The winner's
    attribute rows are CAPTURED while its window is resident (bf16x3
    one-hot dot, exact) so no post-intersect gather table is needed.

    DOUBLE-BUFFERED (VERDICT r4 missing #2): window w+1's fetch is issued
    into the other ping/pong buffer BEFORE window w is scanned, so DMA
    latency overlaps the chunk scan instead of serialising with it. The
    prefetch decision uses the CURRENT best_t — conservative, since best_t
    only shrinks: a window prefetched-then-obsolete is scanned harmlessly
    (exact result, wasted work), and a window skipped at prefetch time
    would also be skipped at scan time. Every started copy is waited in
    the same call, so semaphores stay balanced across the outer bounce
    loop.

    Caller must run the sphere pass first (best_t seeding preserves the
    reference's strict-< triangle rule, dod/Scene.cpp:115-122)."""
    f32 = jnp.float32
    safe = lambda d: jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    idx_d = 1.0 / safe(dx)
    idy_d = 1.0 / safe(dy)
    idz_d = 1.0 / safe(dz)

    def slab(w):
        box = wbox_ref[pl.ds(w, 1), :]
        return _slab_test(
            box, ox, oy, oz, idx_d, idy_d, idz_d, best_t_ref[...], eps
        )

    def _copy(w, win_ref, sem):
        return pltpu.make_async_copy(
            tri_hbm_ref.at[pl.ds(w * WSTREAM, WSTREAM), :], win_ref, sem
        )

    def start_dma(w):
        @pl.when(w % 2 == 0)
        def _():
            _copy(w, win0_ref, sem0).start()

        @pl.when(w % 2 == 1)
        def _():
            _copy(w, win1_ref, sem1).start()

    def scan_window(w, win_ref, sem):
        _copy(w, win_ref, sem).wait()

        # RE-TEST with the tightened best_t: the prefetch decision used the
        # best_t of one window earlier, so windows made obsolete by window
        # w-1's hits would be scanned needlessly (the DMA is sunk cost; the
        # 32-chunk scan is not). Exact either way.
        @pl.when(slab(w))
        def _scan():
            def chunk_body(j, _):
                wv = win_ref[pl.ds(j * TC, TC), :]  # [TC, 128]; cols 0:30 real
                o_u = wv[:, 0:1] * ox + wv[:, 1:2] * oy + wv[:, 2:3] * oz + wv[:, 3:4]
                o_v = wv[:, 4:5] * ox + wv[:, 5:6] * oy + wv[:, 6:7] * oz + wv[:, 7:8]
                o_w = wv[:, 8:9] * ox + wv[:, 9:10] * oy + wv[:, 10:11] * oz + wv[:, 11:12]
                d_u = wv[:, 0:1] * dx + wv[:, 1:2] * dy + wv[:, 2:3] * dz
                d_v = wv[:, 4:5] * dx + wv[:, 5:6] * dy + wv[:, 6:7] * dz
                d_w = wv[:, 8:9] * dx + wv[:, 9:10] * dy + wv[:, 10:11] * dz
                not_par = jnp.abs(d_w) > 1e-12
                den = jnp.where(not_par, d_w, 1.0)
                rcp = pl.reciprocal(den, approx=True)
                rcp = rcp * (2.0 - den * rcp)
                t = -o_w * rcp
                u = o_u + t * d_u
                v = o_v + t * d_v
                # u <= 1 implied by v >= 0 and u + v <= 1 (see
                # pallas_intersect.tri_chunk)
                valid = (
                    not_par
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > eps)
                )
                t = jnp.where(valid, t, _INF)
                rows = jax.lax.broadcasted_iota(jnp.int32, (TC, RT), 0)
                tb = jax.lax.bitcast_convert_type(t, jnp.int32)
                packed = (tb & ~jnp.int32(63)) | rows
                cp_ = jnp.min(packed, axis=0, keepdims=True)
                ct = jax.lax.bitcast_convert_type(
                    cp_ & ~jnp.int32(63), f32
                )
                ci_rel = cp_ & jnp.int32(63)  # [1, RT]
                take = ct < best_t_ref[...]  # [1, RT]
                best_i_ref[...] = jnp.where(
                    take, ci_rel + (w * WSTREAM + j * TC), best_i_ref[...]
                )
                best_t_ref[...] = jnp.where(take, ct, best_t_ref[...])

                return 0

            jax.lax.fori_loop(0, WSTREAM // TC, chunk_body, 0)

            # WINDOW-LEVEL winner-attribute capture, while the window is
            # still resident. Round 4 captured per CHUNK (32 one-hot dots
            # of K=64 per window) which measured as 73% of the whole
            # streamed kernel (sub2: 907 -> 244 ms/pass with capture off);
            # one blocked K=TB capture per window does the same exact
            # gather in WSTREAM/TB dots (one-hot: all other products are
            # 0 * x, bit-exact). Lanes whose winner is later beaten by a
            # later window are simply re-captured there.
            sel_w = best_i_ref[...] - w * WSTREAM  # [1, RT]
            have_t = best_t_ref[...] < _INF
            for blk in range(WSTREAM // TB):
                sub_b = sel_w - blk * TB
                m_b = (sub_b >= 0) & (sub_b < TB) & have_t

                @pl.when(jnp.bool_(False) if _STREAM_NO_CAPTURE
                         else jnp.any(m_b))
                def _cap(blk=blk, sub_b=sub_b, m_b=m_b):
                    rows_b = jax.lax.broadcasted_iota(
                        jnp.int32, (TB, RT), 0
                    )
                    oh = ((rows_b == sub_b) & m_b).astype(jnp.bfloat16)
                    wvb = win_ref[blk * TB : (blk + 1) * TB, 0:TA]
                    hi_w, mid_w, lo_w = _bf16x3(wvb)
                    dn = (((0,), (0,)), ((), ()))
                    acc = jax.lax.dot_general(
                        hi_w, oh, dn, preferred_element_type=f32
                    )
                    acc += jax.lax.dot_general(
                        mid_w, oh, dn, preferred_element_type=f32
                    )
                    acc += jax.lax.dot_general(
                        lo_w, oh, dn, preferred_element_type=f32
                    )  # [TA, RT]
                    attr_ref[...] = jnp.where(
                        m_b, acc, attr_ref[...]
                    )

    # --- software pipeline: prefetch w+1, then wait+scan w ---
    first_wanted = slab(0)

    @pl.when(first_wanted)
    def _():
        start_dma(0)

    def win_body(w, cur_wanted):
        # prefetch decision for w+1 (clamped read; the bounds check keeps
        # padded wbox rows from triggering an out-of-range DMA)
        w_next = jnp.minimum(w + 1, n_windows - 1)
        nxt_wanted = (w + 1 < n_windows) & slab(w_next)

        @pl.when(nxt_wanted)
        def _():
            start_dma(w + 1)

        @pl.when(cur_wanted & (w % 2 == 0))
        def _():
            scan_window(w, win0_ref, sem0)

        @pl.when(cur_wanted & (w % 2 == 1))
        def _():
            scan_window(w, win1_ref, sem1)

        return nxt_wanted

    jax.lax.fori_loop(0, n_windows, win_body, first_wanted)


def _gather(attr_ref, hi_ref, mid_ref, lo_ref, sel, n_pad, a_rows, block):
    """attr_ref[:a_rows] = table[:, sel] (exact), 0 where sel == -1.

    sel: [RT] int32 column index (or -1). Blocks of ``block`` columns are
    skipped when no lane selects into them.
    """
    attr_ref[...] = jnp.zeros_like(attr_ref)
    srow = sel.reshape(1, RT)
    for blk in range(n_pad // block):
        base = blk * block
        srel = srow - base
        inb = (srel >= 0) & (srel < block)

        @pl.when(jnp.any(inb))
        def _():
            rows = jax.lax.broadcasted_iota(jnp.int32, (block, RT), 0)
            oh = (rows == srel).astype(jnp.bfloat16)
            acc = jnp.dot(
                hi_ref[0:a_rows, base : base + block], oh,
                preferred_element_type=jnp.float32,
            )
            acc += jnp.dot(
                mid_ref[0:a_rows, base : base + block], oh,
                preferred_element_type=jnp.float32,
            )
            acc += jnp.dot(
                lo_ref[0:a_rows, base : base + block], oh,
                preferred_element_type=jnp.float32,
            )
            attr_ref[0:a_rows, :] = attr_ref[0:a_rows, :] + acc


def _normalise3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _onb_from_z(zx, zy, zz):
    """OrthoNormalBasis::fromZ with the 0.9999 coincident guard
    (src/math/OrthoNormalBasis.cpp:41-52), on [RT] components."""
    use_y = jnp.abs(zx) > 0.9999
    px = jnp.where(use_y, 0.0, 1.0)
    py = jnp.where(use_y, 1.0, 0.0)
    # xx = normalise(pivot x z); pivot z-component is 0
    xx_ = py * zz
    xy_ = -px * zz
    xz_ = px * zy - py * zx
    xx_, xy_, xz_ = _normalise3(xx_, xy_, xz_)
    # yy = normalise(z x xx)
    yx_ = zy * xz_ - zz * xy_
    yy_ = zz * xx_ - zx * xz_
    yz_ = zx * xy_ - zy * xx_
    yx_, yy_, yz_ = _normalise3(yx_, yy_, yz_)
    return (xx_, xy_, xz_), (yx_, yy_, yz_)


def _megakernel(
    # intersection tables
    tri_ref, box_ref, box1_ref, sph_ref,
    # winner-gather tables (bf16x3)
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
    misc_ref,  # [1, 8] f32: env r, g, b
    org_ref, dir_ref, beta_ref, alive_ref,  # [3|1, RT] initial state
    unif_ref,  # [4*NB, RT] per-bounce (u, acos(u), v, p) — acos precomputed
    # outside the kernel (Mosaic has no acos primitive; doing it outside
    # also keeps the stream bit-identical to the unfused path)
    acc_ref,  # [3, RT] out
    cnt_ref,  # [1, RT] out int32: live-bounce count per lane
    *rest,  # [states_ref, ts_ref, ii_ref if emit] + scratch
    n_tri, n_sph, t_pad, s_pad, tcoef_pad, scoef_pad, eps, cull, nb,
    emit=False,
):
    """``emit``: additionally write the path-replay residuals — the INPUT
    state of every bounce ([nb*13, RT]: org3 dir3 beta3 alive1 acc3, the
    bounce_step state layout) and the per-bounce winner records
    ([nb, RT] t with +inf miss, [nb, RT] packed idx) — so the whole
    differentiable forward chain runs in ONE dispatch instead of nb
    bounce_step dispatches (models/replay.py)."""
    if emit:
        states_ref, ts_ref, ii_ref = rest[0:3]
        rest = rest[3:]
    best_t_ref, best_i_ref, attr_ref, st_ref = rest
    env = (misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2])
    # Path state lives in the st_ref scratch (org 0:3, dir 3:6, beta 6:9,
    # alive 9) so the per-bounce shading tail can run under pl.when —
    # tiles with no hits this bounce (dead regions of open scenes) skip
    # ALL of it, paying only the intersect early-out and the env update.
    st_ref[0:3, :] = org_ref[...]
    st_ref[3:6, :] = dir_ref[...]
    st_ref[6:9, :] = beta_ref[...]
    st_ref[9, :] = alive_ref[0, :]
    acc_ref[...] = jnp.zeros((3, RT), jnp.float32)
    cnt_ref[...] = jnp.zeros((1, RT), jnp.int32)

    for d in range(nb):
        ox, oy, oz = st_ref[0, :], st_ref[1, :], st_ref[2, :]
        dx, dy, dz = st_ref[3, :], st_ref[4, :], st_ref[5, :]
        bx, by, bz = st_ref[6, :], st_ref[7, :], st_ref[8, :]
        alive = st_ref[9, :] != 0.0
        cnt_ref[0, :] = cnt_ref[0, :] + alive.astype(jnp.int32)
        if emit:
            # replay residual: the INPUT state of this bounce
            states_ref[13 * d : 13 * d + 10, :] = st_ref[...]
            states_ref[13 * d + 10 : 13 * d + 13, :] = acc_ref[...]
        intersect_tile(
            tri_ref, box_ref, box1_ref, sph_ref,
            ox, oy, oz, dx, dy, dz, alive, best_t_ref, best_i_ref,
            n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
            eps=eps, cull=cull,
        )
        # slope profiling: PT3_SLOPE_DUP=intersect re-runs the (stateful,
        # self-reinitialising — identical result) intersect stage so its
        # per-iteration cost shows up as the bench-time delta
        if _SLOPE_DUP_INTERSECT:
            intersect_tile(
                tri_ref, box_ref, box1_ref, sph_ref,
                ox, oy, oz, dx, dy, dz, alive, best_t_ref, best_i_ref,
                n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
                eps=eps, cull=cull,
            )
        t = best_t_ref[0, :]
        idx = best_i_ref[0, :]
        hit = alive & jnp.isfinite(t) & (t > 0.0)
        miss = alive & ~hit
        if emit:
            # winner record (bounce_step's emit_hit layout)
            ts_ref[d, :] = jnp.where(hit, t, _INF)
            ii_ref[d, :] = jnp.where(hit, idx, 0)

        # environment on miss (Renderer.cpp:66-67)
        mf = miss.astype(jnp.float32)
        acc_ref[0, :] = acc_ref[0, :] + mf * bx * env[0]
        acc_ref[1, :] = acc_ref[1, :] + mf * by * env[1]
        acc_ref[2, :] = acc_ref[2, :] + mf * bz * env[2]

        # every lane dies unless the shading tail below revives it
        st_ref[9, :] = jnp.zeros((RT,), jnp.float32)

        @pl.when(jnp.any(hit))
        def _shade(d=d, t=t, idx=idx, hit=hit,
                   ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                   bx=bx, by=by, bz=bz):
            _shade_tail(
                th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
                acc_ref, attr_ref, st_ref,
                t, idx, hit, ox, oy, oz, dx, dy, dz, bx, by, bz,
                unif_ref[4 * d, :], unif_ref[4 * d + 1, :],
                unif_ref[4 * d + 2, :], unif_ref[4 * d + 3, :],
                n_tri=n_tri, n_sph=n_sph,
                tcoef_pad=tcoef_pad, scoef_pad=scoef_pad,
            )


def _shade_tail(
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
    acc_ref, attr_ref, st_ref,
    t, idx, hit, ox, oy, oz, dx, dy, dz, bx, by, bz,
    u, acos_u, v, p,
    *, n_tri, n_sph, tcoef_pad, scoef_pad, acc_base=0, no_glossy=False,
    tri_pregathered=False,
):
    """Post-intersection bounce tail: winner gathers, shading, sampling,
    state update. Runs only when the tile has at least one hit.

    ``no_glossy``: static guarantee that every material's cone angle is
    below EPSILON — the cone-sample trig/ONB block is skipped (its mirror
    early-out is the only reachable branch) and ``acos_u`` is unused."""
    tri_win = hit & (idx < n_tri)
    sph_win = hit & ~tri_win

    if True:  # keep the original body's indentation depth
        # --- winner attributes (exact bf16x3 one-hot gathers) ---
        tri_attr = None
        if n_tri > 0:
            if not tri_pregathered:
                sel_t = jnp.where(tri_win, idx, -1)
                _gather(attr_ref, th_ref, tm_ref, tl_ref, sel_t, tcoef_pad, TA, TB)
                if _SLOPE_DUP_GATHER:
                    _gather(attr_ref, th_ref, tm_ref, tl_ref, sel_t, tcoef_pad, TA, TB)
            # streaming kernel: attr rows were CAPTURED during the window
            # loop; non-tri-win lanes hold stale values, masked out by the
            # tri_win selects below
            tri_attr = attr_ref[0:TA, :]  # value snapshot (pre sphere reuse)
            # (u, v) at the hit + d_w sign for backface flip
            # (ops/intersect._triangle_shade_info)
            o_u = tri_attr[0] * ox + tri_attr[1] * oy + tri_attr[2] * oz + tri_attr[3]
            o_v = tri_attr[4] * ox + tri_attr[5] * oy + tri_attr[6] * oz + tri_attr[7]
            d_u = tri_attr[0] * dx + tri_attr[1] * dy + tri_attr[2] * dz
            d_v = tri_attr[4] * dx + tri_attr[5] * dy + tri_attr[6] * dz
            d_w = tri_attr[8] * dx + tri_attr[9] * dy + tri_attr[10] * dz
            uu = o_u + t * d_u
            vv = o_v + t * d_v
            n0x, n0y, n0z = tri_attr[12], tri_attr[13], tri_attr[14]
            n1x, n1y, n1z = tri_attr[15], tri_attr[16], tri_attr[17]
            n2x, n2y, n2z = tri_attr[18], tri_attr[19], tri_attr[20]
            inx = n0x + uu * (n1x - n0x) + vv * (n2x - n0x)
            iny = n0y + uu * (n1y - n0y) + vv * (n2y - n0y)
            inz = n0z + uu * (n1z - n0z) + vv * (n2z - n0z)
            inx, iny, inz = _normalise3(inx, iny, inz)
            backface = d_w > 0.0
            flip_t = jnp.where(backface, -1.0, 1.0)
            tnx, tny, tnz = inx * flip_t, iny * flip_t, inz * flip_t
            t_em = (tri_attr[21], tri_attr[22], tri_attr[23])
            t_di = (tri_attr[24], tri_attr[25], tri_attr[26])
            t_ior, t_refl, t_cone = tri_attr[27], tri_attr[28], tri_attr[29]
            t_inside = backface

        # hit position (shared)
        t_safe = jnp.where(hit, t, 0.0)
        px_ = ox + t_safe * dx
        py_ = oy + t_safe * dy
        pz_ = oz + t_safe * dz

        if n_sph > 0:
            sel_s = jnp.where(sph_win, idx - n_tri, -1)
            # attr scratch reuse is safe: the triangle reads above produced
            # values before this write (ref reads/writes are ordered)
            _gather(attr_ref, sh_ref, sm_ref, sl_ref, sel_s, scoef_pad, SA, SC)
            if _SLOPE_DUP_GATHER:
                _gather(attr_ref, sh_ref, sm_ref, sl_ref, sel_s, scoef_pad, SA, SC)
            sph_attr = attr_ref[0:SA, :]
            cx_, cy_, cz_ = sph_attr[0], sph_attr[1], sph_attr[2]
            snx, sny, snz = _normalise3(px_ - cx_, py_ - cy_, pz_ - cz_)
            s_inside = snx * dx + sny * dy + snz * dz > 0.0
            flip_s = jnp.where(s_inside, -1.0, 1.0)
            snx, sny, snz = snx * flip_s, sny * flip_s, snz * flip_s
            s_em = (sph_attr[3], sph_attr[4], sph_attr[5])
            s_di = (sph_attr[6], sph_attr[7], sph_attr[8])
            s_ior, s_refl, s_cone = sph_attr[9], sph_attr[10], sph_attr[11]

        if n_tri > 0 and n_sph > 0:
            tw = tri_win
            nx = jnp.where(tw, tnx, snx)
            ny = jnp.where(tw, tny, sny)
            nz = jnp.where(tw, tnz, snz)
            emr = jnp.where(tw, t_em[0], s_em[0])
            emg = jnp.where(tw, t_em[1], s_em[1])
            emb = jnp.where(tw, t_em[2], s_em[2])
            dir_ = jnp.where(tw, t_di[0], s_di[0])
            dig = jnp.where(tw, t_di[1], s_di[1])
            dib = jnp.where(tw, t_di[2], s_di[2])
            ior = jnp.where(tw, t_ior, s_ior)
            refl0 = jnp.where(tw, t_refl, s_refl)
            cone = jnp.where(tw, t_cone, s_cone)
            # logical (not where) select: Mosaic can't lower i8->i1 selects
            inside = (tw & t_inside) | (~tw & s_inside)
        elif n_tri > 0:
            nx, ny, nz = tnx, tny, tnz
            emr, emg, emb = t_em
            dir_, dig, dib = t_di
            ior, refl0, cone = t_ior, t_refl, t_cone
            inside = t_inside
        else:
            nx, ny, nz = snx, sny, snz
            emr, emg, emb = s_em
            dir_, dig, dib = s_di
            ior, refl0, cone = s_ior, s_refl, s_cone
            inside = s_inside

        # emission per shading event (Material.cpp:18-21)
        hf = hit.astype(jnp.float32)
        acc_ref[acc_base + 0, :] = acc_ref[acc_base + 0, :] + hf * bx * emr
        acc_ref[acc_base + 1, :] = acc_ref[acc_base + 1, :] + hf * by * emg
        acc_ref[acc_base + 2, :] = acc_ref[acc_base + 2, :] + hf * bz * emb

        # Fresnel-or-fixed reflectivity (dod/Scene.cpp:140-146); the
        # reference's rPerp==rParallel quirk preserved (ops/vecmath.py)
        ior_from = jnp.where(inside, ior, 1.0)
        ior_to = jnp.where(inside, 1.0, ior)
        ratio = ior_from / ior_to
        cos_i = -(dx * nx + dy * ny + dz * nz)
        sin_t_sq = ratio * ratio * (1.0 - cos_i * cos_i)
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
        # denominator guard (see vecmath.reflectance): exact-grazing TIR
        # boundary is 0/0 whose NaN partials leak through zero cotangents
        den_f = ior_from * cos_i + ior_to * cos_t
        ok_f = den_f > 0.0
        r_perp = jnp.where(
            ok_f,
            (ior_from * cos_i - ior_to * cos_t) / jnp.where(ok_f, den_f, 1.0),
            1.0,
        )
        fresnel = jnp.where(sin_t_sq > 1.0, 1.0, r_perp * r_perp)
        refl = jnp.where(refl0 < 0.0, fresnel, refl0)

        spec = p < refl

        # cone sample around the mirror direction (Samples.cpp:6-20)
        rdot = 2.0 * (dx * nx + dy * ny + dz * nz)
        rx, ry, rz = dx - nx * rdot, dy - ny * rdot, dz - nz * rdot
        if no_glossy:
            # every material's cone angle is < EPSILON, so every specular
            # event takes the mirror early-out (Samples.cpp:9) — the whole
            # cone ONB + trig block (and the acos_u input) is statically
            # dead. Exact: identical to the mirror branch below.
            conex, coney, conez = rx, ry, rz
        else:
            theta = cone * (1.0 - 2.0 * acos_u / math.pi)
            cradius = jnp.sin(theta)
            cz_scale = jnp.cos(theta)
            rth = v * (2.0 * math.pi)
            (cxx, cxy, cxz), (cyx, cyy, cyz) = _onb_from_z(rx, ry, rz)
            lx = jnp.cos(rth) * cradius
            ly = jnp.sin(rth) * cradius
            sx = cxx * lx + cyx * ly + rx * cz_scale
            sy = cxy * lx + cyy * ly + ry * cz_scale
            sz = cxz * lx + cyz * ly + rz * cz_scale
            sx, sy, sz = _normalise3(sx, sy, sz)
            mirror = cone < EPSILON
            conex = jnp.where(mirror, rx, sx)
            coney = jnp.where(mirror, ry, sy)
            conez = jnp.where(mirror, rz, sz)

        # cosine hemisphere around the normal (Samples.cpp:22-31)
        (hxx, hxy, hxz), (hyx, hyy, hyz) = _onb_from_z(nx, ny, nz)
        hth = (2.0 * math.pi) * u
        hr = jnp.sqrt(jnp.maximum(v, 0.0))
        hlx = jnp.cos(hth) * hr
        hly = jnp.sin(hth) * hr
        hlz = jnp.sqrt(jnp.maximum(1.0 - v, 0.0))
        hx = hxx * hlx + hyx * hly + nx * hlz
        hy = hxy * hlx + hyy * hly + ny * hlz
        hz = hxz * hlx + hyz * hly + nz * hlz
        hx, hy, hz = _normalise3(hx, hy, hz)

        ndx = jnp.where(spec, conex, hx)
        ndy = jnp.where(spec, coney, hy)
        ndz = jnp.where(spec, conez, hz)

        sf = spec.astype(jnp.float32)
        nbx = bx * (sf + (1.0 - sf) * dir_)
        nby = by * (sf + (1.0 - sf) * dig)
        nbz = bz * (sf + (1.0 - sf) * dib)

        # state update; zero-throughput kill (models/integrator.bounce)
        st_ref[0, :] = jnp.where(hit, px_, ox)
        st_ref[1, :] = jnp.where(hit, py_, oy)
        st_ref[2, :] = jnp.where(hit, pz_, oz)
        st_ref[3, :] = jnp.where(hit, ndx, dx)
        st_ref[4, :] = jnp.where(hit, ndy, dy)
        st_ref[5, :] = jnp.where(hit, ndz, dz)
        nbx = jnp.where(hit, nbx, bx)
        nby = jnp.where(hit, nby, by)
        nbz = jnp.where(hit, nbz, bz)
        st_ref[6, :] = nbx
        st_ref[7, :] = nby
        st_ref[8, :] = nbz
        alive_next = hit & ((nbx != 0.0) | (nby != 0.0) | (nbz != 0.0))
        st_ref[9, :] = alive_next.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tri", "n_sph", "tcoef_pad", "scoef_pad", "eps", "cull", "nb",
        "interpret", "emit",
    ),
)
def _run_fused(
    tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl, misc,
    org, dirn, beta, alive, unif,
    n_tri, n_sph, tcoef_pad, scoef_pad, eps, cull, nb, interpret=False,
    emit=False,
):
    r = org.shape[1]
    t_pad = tri_tab.shape[0]
    s_pad = sph_tab.shape[0]
    kernel = functools.partial(
        _megakernel,
        n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
        tcoef_pad=tcoef_pad, scoef_pad=scoef_pad,
        eps=eps, cull=cull, nb=nb, emit=emit,
    )
    tab = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = lambda rows: pl.BlockSpec((rows, RT), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(r // RT,),
        in_specs=[
            tab((t_pad, 12)),
            tab((box_tab.shape[0], 8)),
            tab((box1_tab.shape[0], 8)),
            tab((s_pad, 8)),
            tab((TA, tcoef_pad)),
            tab((TA, tcoef_pad)),
            tab((TA, tcoef_pad)),
            tab((SA, scoef_pad)),
            tab((SA, scoef_pad)),
            tab((SA, scoef_pad)),
            tab((1, 8)),
            lane(3), lane(3), lane(3), lane(1), lane(4 * nb),
        ],
        out_specs=[lane(3), lane(1)]
        + ([lane(13 * nb), lane(nb), lane(nb)] if emit else []),
        out_shape=[
            jax.ShapeDtypeStruct((3, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ]
        + (
            [
                jax.ShapeDtypeStruct((13 * nb, r), jnp.float32),
                jax.ShapeDtypeStruct((nb, r), jnp.float32),
                jax.ShapeDtypeStruct((nb, r), jnp.int32),
            ]
            if emit
            else []
        ),
        scratch_shapes=[
            pltpu.VMEM((1, RT), jnp.float32),
            pltpu.VMEM((1, RT), jnp.int32),
            pltpu.VMEM((TA, RT), jnp.float32),
            pltpu.VMEM((10, RT), jnp.float32),
        ],
        interpret=interpret,
    )(tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl, misc,
      org, dirn, beta, alive, unif)


def fused_bounces(
    packed: PackedSceneFused,
    environment: jnp.ndarray,  # [3]
    org: jnp.ndarray,  # [3, N]
    dirn: jnp.ndarray,  # [3, N]
    beta: jnp.ndarray,  # [3, N]
    alive: jnp.ndarray,  # [N] bool
    unif: jnp.ndarray,  # [4 * nb, N] per-bounce (u, acos(u), v, p) rows
    eps: float,
    nb: int,
    cull: bool = False,
    interpret: bool = False,
    with_residuals: bool = False,
):
    """Run ``nb`` fused bounces. Returns (acc [3, N], live_ray_count [N]).

    ``with_residuals`` additionally returns the path-replay residuals
    (states [nb*13, N] = each bounce's input state in bounce_step layout,
    t [nb, N] winner distances (+inf miss), idx [nb, N] packed winner
    indices) so models/replay.py runs its whole forward in ONE dispatch.

    ``cull`` defaults OFF for bounce rays: measured on v5e (VALIDATION.md),
    per-leaf slab culling LOSES on post-first-bounce tiles — hemisphere-
    scattered directions make every chunk's "any live lane can improve"
    test pass, so the tests are pure overhead (suzanne 77->72 ms/pass,
    ce 6.7->6.4). Coherent camera tiles (ops/pallas_intersect
    .intersect_packed) keep culling on.
    """
    n = org.shape[1]
    pad = (-n) % RT
    f32 = lambda x: x.astype(jnp.float32)
    if pad:
        zpad3 = jnp.zeros((3, pad), jnp.float32)
        org = jnp.concatenate([f32(org), zpad3], axis=1)
        dirn = jnp.concatenate([f32(dirn), zpad3], axis=1)
        beta = jnp.concatenate([f32(beta), zpad3], axis=1)
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])
        unif = jnp.concatenate(
            [f32(unif), jnp.zeros((unif.shape[0], pad), jnp.float32)], axis=1
        )
    else:
        org, dirn, beta, unif = f32(org), f32(dirn), f32(beta), f32(unif)
    misc = jnp.concatenate(
        [environment.astype(jnp.float32).reshape(3), jnp.zeros(5, jnp.float32)]
    ).reshape(1, 8)
    do_cull = cull and packed.n_tri > 2 * TC
    th, tm, tl = packed.tri_coef
    sh, sm, sl = packed.sph_coef
    res = _run_fused(
        packed.tri_tab, packed.box_tab, packed.box1_tab, packed.sph_tab,
        th, tm, tl, sh, sm, sl, misc,
        org, dirn, beta, alive.astype(jnp.float32).reshape(1, -1), unif,
        packed.n_tri, packed.n_sph,
        packed.tri_coef_pad, packed.sph_coef_pad,
        float(eps), do_cull, int(nb), interpret, with_residuals,
    )
    if pad:
        res = [x[:, :n] for x in res]
    acc, cnt = res[0], res[1]
    if with_residuals:
        return acc, cnt[0], res[2], res[3], res[4]
    return acc, cnt[0]


# ---------------------------------------------------------------------------
# Multi-pass megakernel with PATH REGENERATION.
#
# The single-pass kernel above dispatches every lane for every bounce even
# though survivors are RNG-sprinkled (tools/measure_waste.py: 69% of
# dispatched lane-bounces on suzanne are dead lanes in half-live tiles).
# This variant processes S sample passes per lane: a lane is a fixed
# (pixel, substratum) slot; when its path dies it immediately reloads the
# next sample's first-bounce state (precomputed outside on the SAME RNG
# streams as the unfused path) and keeps tracing. A lax.while_loop runs
# until every lane has exhausted its samples — occupancy stays near 100%
# and the iteration count collapses from S*nb to ~max-lane total depth.
# This is the TPU answer to wavefront compaction (SURVEY section 7 phase 2c):
# refill in place instead of shuffling lanes.
# ---------------------------------------------------------------------------


def _megakernel_regen(
    tri_ref, box_ref, box1_ref, sph_ref,
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
    misc_ref,  # [1, 8] f32: env r, g, b
    state0_ref,  # [S*10, RT]: per-sample first-bounce state (org,dir,beta,alive)
    nexta_ref,  # [S+1, RT] f32: row 0 = first alive sample (or S);
    #              row ss+1 = next alive sample > ss (or S)
    unif_ref,  # [S*NB*4, RT]: (u, acos u, v, p) per (sample, bounce)
    acc_ref,  # [3, RT] out: sum of path radiance over ALL samples
    cnt_ref,  # [1, RT] out int32: live-bounce count per lane
    best_t_ref, best_i_ref, attr_ref, st_ref,  # scratch; st rows 10=s, 11=d
    *,
    n_tri, n_sph, t_pad, s_pad, tcoef_pad, scoef_pad, eps, cull, nb, s_count,
):
    env = (misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2])
    acc_ref[...] = jnp.zeros((3, RT), jnp.float32)
    cnt_ref[...] = jnp.zeros((1, RT), jnp.int32)

    def regen(first: bool):
        """Dead lanes load the next alive sample's first-bounce state.

        One scalar branch guards the whole refill (iterations where no lane
        died — most of them in closed scenes — skip it entirely); inside,
        the per-sample row copies are branchless masked selects (a
        per-sample pl.when costs S vector->scalar reductions + branches
        every burst, which measured slower than the unconditional selects).
        """

        def refill(want, s_cur, s_next):
            can = want & (s_next < float(s_count))
            for ss in range(s_count):
                m = can & (s_next == float(ss))
                for r in range(10):
                    st_ref[r, :] = jnp.where(
                        m, state0_ref[ss * 10 + r, :], st_ref[r, :]
                    )
            st_ref[10, :] = jnp.where(can, s_next, s_cur)
            st_ref[11, :] = jnp.where(can, 1.0, st_ref[11, :])
            return can

        if first:
            want = jnp.full((RT,), True)
            can = refill(want, st_ref[10, :], nexta_ref[0, :])
            # lanes that found no next sample are exhausted
            st_ref[9, :] = jnp.where(can, st_ref[9, :], 0.0)
        else:
            want = st_ref[9, :] == 0.0

            @pl.when(jnp.any(want))
            def _():
                s_cur = st_ref[10, :]
                # next alive sample strictly after s_cur: masked row select
                s_next = jnp.full((RT,), float(s_count), jnp.float32)
                for ss in range(s_count):
                    m = want & (s_cur == float(ss))
                    s_next = jnp.where(m, nexta_ref[ss + 1, :], s_next)
                refill(want, s_cur, s_next)

    st_ref[...] = jnp.zeros((12, RT), jnp.float32)
    regen(first=True)

    def cond(carry):
        i, done = carry
        return jnp.logical_not(done) & (i < s_count * (nb + 1))

    def body(carry):
        i, _ = carry
        ox, oy, oz = st_ref[0, :], st_ref[1, :], st_ref[2, :]
        dx, dy, dz = st_ref[3, :], st_ref[4, :], st_ref[5, :]
        bx, by, bz = st_ref[6, :], st_ref[7, :], st_ref[8, :]
        alive = st_ref[9, :] != 0.0
        s_cur = st_ref[10, :]
        d_cur = st_ref[11, :]
        cnt_ref[0, :] = cnt_ref[0, :] + alive.astype(jnp.int32)
        # guard_live: the while cond guarantees a live lane on loop entry,
        # so the any(live) early-out is a pure per-iteration reduction tax
        intersect_tile(
            tri_ref, box_ref, box1_ref, sph_ref,
            ox, oy, oz, dx, dy, dz, alive, best_t_ref, best_i_ref,
            n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
            eps=eps, cull=cull, guard_live=False,
        )
        # slope profiling: PT3_SLOPE_DUP=intersect re-runs the (stateful,
        # self-reinitialising — identical result) intersect stage so its
        # per-iteration cost shows up as the bench-time delta
        if _SLOPE_DUP_INTERSECT:
            intersect_tile(
                tri_ref, box_ref, box1_ref, sph_ref,
                ox, oy, oz, dx, dy, dz, alive, best_t_ref, best_i_ref,
                n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
                eps=eps, cull=cull, guard_live=False,
            )
        t = best_t_ref[0, :]
        idx = best_i_ref[0, :]
        hit = alive & jnp.isfinite(t) & (t > 0.0)
        miss = alive & ~hit

        mf = miss.astype(jnp.float32)
        acc_ref[0, :] = acc_ref[0, :] + mf * bx * env[0]
        acc_ref[1, :] = acc_ref[1, :] + mf * by * env[1]
        acc_ref[2, :] = acc_ref[2, :] + mf * bz * env[2]

        st_ref[9, :] = jnp.zeros((RT,), jnp.float32)

        @pl.when(jnp.any(hit))
        def _shade():
            # per-lane uniforms: masked select over the (sample, depth) grid
            u = jnp.zeros((RT,), jnp.float32)
            au = jnp.zeros((RT,), jnp.float32)
            v = jnp.zeros((RT,), jnp.float32)
            p = jnp.zeros((RT,), jnp.float32)
            for ss in range(s_count):
                for dd in range(1, nb + 1):
                    m = hit & (s_cur == float(ss)) & (d_cur == float(dd))
                    base = (ss * nb + (dd - 1)) * 4
                    u = jnp.where(m, unif_ref[base, :], u)
                    au = jnp.where(m, unif_ref[base + 1, :], au)
                    v = jnp.where(m, unif_ref[base + 2, :], v)
                    p = jnp.where(m, unif_ref[base + 3, :], p)
            _shade_tail(
                th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
                acc_ref, attr_ref, st_ref,
                t, idx, hit, ox, oy, oz, dx, dy, dz, bx, by, bz,
                u, au, v, p,
                n_tri=n_tri, n_sph=n_sph,
                tcoef_pad=tcoef_pad, scoef_pad=scoef_pad,
            )
            # bounce depth advances; the depth cutoff kills at d > nb
            d_new = jnp.where(hit, d_cur + 1.0, d_cur)
            st_ref[11, :] = d_new
            st_ref[9, :] = jnp.where(
                d_new > float(nb), 0.0, st_ref[9, :]
            )

        regen(first=False)
        done = jnp.logical_not(jnp.any(st_ref[9, :] != 0.0))
        return i + 1, done

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tri", "n_sph", "tcoef_pad", "scoef_pad", "eps", "cull", "nb",
        "s_count", "interpret",
    ),
)
def _run_regen(
    tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl, misc,
    state0, nexta, unif,
    n_tri, n_sph, tcoef_pad, scoef_pad, eps, cull, nb, s_count,
    interpret=False,
):
    r = state0.shape[1]
    t_pad = tri_tab.shape[0]
    s_pad = sph_tab.shape[0]
    kernel = functools.partial(
        _megakernel_regen,
        n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
        tcoef_pad=tcoef_pad, scoef_pad=scoef_pad,
        eps=eps, cull=cull, nb=nb, s_count=s_count,
    )
    tab = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = lambda rows: pl.BlockSpec((rows, RT), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(r // RT,),
        in_specs=[
            tab((t_pad, 12)),
            tab((box_tab.shape[0], 8)),
            tab((box1_tab.shape[0], 8)),
            tab((s_pad, 8)),
            tab((TA, tcoef_pad)),
            tab((TA, tcoef_pad)),
            tab((TA, tcoef_pad)),
            tab((SA, scoef_pad)),
            tab((SA, scoef_pad)),
            tab((SA, scoef_pad)),
            tab((1, 8)),
            lane(10 * s_count), lane(s_count + 1), lane(4 * nb * s_count),
        ],
        out_specs=[lane(3), lane(1)],
        out_shape=[
            jax.ShapeDtypeStruct((3, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RT), jnp.float32),
            pltpu.VMEM((1, RT), jnp.int32),
            pltpu.VMEM((TA, RT), jnp.float32),
            pltpu.VMEM((12, RT), jnp.float32),
        ],
        interpret=interpret,
    )(tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl, misc,
      state0, nexta, unif)


def fused_passes(
    packed: PackedSceneFused,
    environment: jnp.ndarray,  # [3]
    state0: jnp.ndarray,  # [S*10, N]: rows (org3 dir3 beta3 alive1) per sample
    unif: jnp.ndarray,  # [S*nb*4, N]
    eps: float,
    nb: int,
    s_count: int,
    cull: bool = False,
    interpret: bool = False,
):
    """Run S regenerating sample passes. Returns (acc [3, N] summed over
    samples, live_ray_count [N]).

    ``cull`` defaults OFF: see fused_bounces — per-leaf culling measured
    as a net loss on incoherent bounce-ray tiles (VALIDATION.md)."""
    n = state0.shape[1]
    pad = (-n) % RT
    f32 = lambda x: x.astype(jnp.float32)
    if pad:
        state0 = jnp.concatenate(
            [f32(state0), jnp.zeros((state0.shape[0], pad), jnp.float32)],
            axis=1,
        )
        unif = jnp.concatenate(
            [f32(unif), jnp.zeros((unif.shape[0], pad), jnp.float32)], axis=1
        )
    else:
        state0, unif = f32(state0), f32(unif)
    # next-alive tables from the per-sample alive rows (row ss*10+9)
    alive0 = state0[9::10, :] != 0.0  # [S, Npad]
    npad = state0.shape[1]
    nxt = jnp.full((npad,), float(s_count), jnp.float32)
    rows = [None] * (s_count + 1)
    for ss in range(s_count - 1, -1, -1):
        rows[ss + 1] = nxt  # next alive sample STRICTLY > ss
        nxt = jnp.where(alive0[ss], float(ss), nxt)
    rows[0] = nxt  # first alive sample >= 0
    nexta = jnp.stack(rows)
    misc = jnp.concatenate(
        [environment.astype(jnp.float32).reshape(3), jnp.zeros(5, jnp.float32)]
    ).reshape(1, 8)
    do_cull = cull and packed.n_tri > 2 * TC
    th, tm, tl = packed.tri_coef
    sh, sm, sl = packed.sph_coef
    acc, cnt = _run_regen(
        packed.tri_tab, packed.box_tab, packed.box1_tab, packed.sph_tab,
        th, tm, tl, sh, sm, sl, misc, state0, nexta, unif,
        packed.n_tri, packed.n_sph,
        packed.tri_coef_pad, packed.sph_coef_pad,
        float(eps), do_cull, int(nb), int(s_count), interpret,
    )
    if pad:
        acc = acc[:, :n]
        cnt = cnt[:, :n]
    return acc, cnt[0]


# ---------------------------------------------------------------------------
# Regenerating megakernel with IN-KERNEL COUNTER RNG ("krng").
#
# The table-mode regen kernel above precomputes every bounce uniform into
# [S*nb*4, N] HBM tables and selects per-lane values with an O(S*nb)
# masked-select loop per while-loop iteration — the VMEM ceiling on the
# pass-fusion factor S and a per-iteration vector tax bigger than the whole
# shading tail (round-2 VALIDATION). This variant computes (u, v, p) on the
# VPU at the point of use with a counter-based hash keyed on
# (canonical lane id, global sample index, bounce depth, seed) —
# ops/kernel_rng.pcg4d — so:
#
#   * the uniform tables and their HBM round trip disappear entirely;
#   * the per-iteration select tax becomes ~30 VPU ops;
#   * the sample-refill loop is range-bounded (min..max of the samples
#     being loaded this burst) with a DYNAMIC 16-row slice of the state
#     table instead of an S-unrolled select chain, collapsing compile size
#     from O(S * chunks) to O(chunks);
#   * the per-sample next-alive table is replaced by a find-first-set over
#     a per-lane alive BITMASK (two 32-bit words: S <= 64 samples per dispatch).
#
# Draws are a pure function of (lane, sample, depth, seed): bit-reproducible
# for a fixed seed under any dispatch tiling, lane sort or sharding. The
# stream differs from the lax.scan wavefront's threefry by construction, so
# image equality with it (and with the compiled C++ reference) is gated
# statistically (SURVEY.md section 6b.4; tests/test_kernel_rng.py).
# ---------------------------------------------------------------------------


def _megakernel_regen_krng(
    tri_ref, box_ref, box1_ref, sph_ref,
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
    misc_ref,  # [1, 8] f32: env r, g, b
    imisc_ref,  # [1, 8] i32: k0, k1 (key words, bitcast), sample0
    lane_ref,  # [1, RT] i32: canonical lane ids (pixel-global)
    amask_ref,  # [2, RT] i32: bit ss of word ss//32 set <=> sample ss
    #             alive at birth (two words -> up to 64 fused passes)
    state0_ref,  # [10*SP, RT] row-major segments: row r of sample s at
    #              r*SP + s (SP = s_count padded to 8); rows = per-sample
    #              first-bounce state (org3 dir3 beta3 alive1)
    *rest,  # [resid_in_ref if resume] acc_ref cnt_ref [resid_out_ref if
    #         thresh] best_t_ref best_i_ref attr_ref st_ref is_ref
    n_tri, n_sph, t_pad, s_pad, tcoef_pad, scoef_pad, eps, cull, nb, s_count,
    s_pad_samples=0,
    thresh=0, resume=False, no_glossy=False, stream=False, n_windows=0,
    replay=False,
):
    """``stream``: triangles come from an HBM-resident [TpadW, 32] table
    (tri_ref) scanned in WSTREAM windows with per-window AABB skip and
    in-loop attribute capture (_stream_tri); box_ref carries the window
    AABBs and the th/tm/tl gather tables are unused dummies.

    thresh > 0: the per-tile loop STOPS once live lanes drop below
    ``thresh`` and emits the in-flight state (resid_out) so a compacted
    continuation dispatch can finish the stragglers at high occupancy —
    the regen analogue of tail compaction (waste after the feedback sort is
    the stochastic spread of realized lane lifetimes; see VALIDATION.md).
    ``resume``: initial state comes from resid_in instead of a first refill.
    Residual layout [12, RT] f32: st rows 0..9, then s_cur, d_cur (exact
    small ints in f32).

    ``replay``: the REGENERATING PATH-REPLAY forward (models/replay.
    trace_passes_replay). Every while iteration additionally writes one
    RRES-row residual block (input org/dir/beta, winner t/idx, current
    sample/depth) to rresid_ref and the realized per-tile iteration count
    to nit_ref, so the backward (regen_replay_bwd) walks only the
    REALIZED (lane, bounce) events instead of s_count*nb dense bounces —
    the round-4 verdict's dead-lane fix for the training path. Incompatible
    with thresh/resume/stream (the residual row index is the loop counter)."""
    from . import kernel_rng as kr

    kr_IN_P1 = kr._IN_P1
    kr_IN_P2 = kr._IN_P2
    if replay:
        assert not (thresh or resume or stream)
        assert _UNROLL == 1, "replay residual slots assume one bounce/iter"
    i = 0
    resid_in_ref = rest[i] if resume else None
    i += 1 if resume else 0
    acc_ref, cnt_ref = rest[i], rest[i + 1]
    i += 2
    resid_out_ref = rest[i] if thresh else None
    i += 1 if thresh else 0
    rresid_ref = nit_ref = None
    if replay:
        rresid_ref, nit_ref = rest[i], rest[i + 1]
        i += 2
    best_t_ref, best_i_ref, attr_ref, st_ref, is_ref = rest[i : i + 5]
    i += 5
    win0_ref = win1_ref = sem0 = sem1 = None
    if stream:
        win0_ref, win1_ref, sem0, sem1 = rest[i : i + 4]
        i += 4
    dummy_acc_ref = dummy_st_ref = None
    if _SLOPE_DUP_SHADE or _SLOPE_DUP_REFILLCOPY or _SLOPE_DUP_KRNG:
        dummy_acc_ref, dummy_st_ref = rest[i : i + 2]

    u32 = jnp.uint32
    env = (misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2])
    # int32 -> uint32 is a value-preserving reinterpret (two's complement);
    # Mosaic rejects SCALAR tpu.bitcast, so route scalars through astype and
    # keep lax.bitcast_convert_type for vectors only
    sample0 = imisc_ref[0, 2]
    # per-channel RNG seeds (host-derived, imisc slots 3..5) as a [3, 1]
    # column; built once, loop-invariant
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    seeds = jnp.where(
        rows3 == 0, imisc_ref[0, 3],
        jnp.where(rows3 == 1, imisc_ref[0, 4], imisc_ref[0, 5]),
    ).astype(u32)
    lane_row = jax.lax.bitcast_convert_type(lane_ref[...], u32)  # [1, RT]
    # uint32 multiplies are the expensive VPU ops in the hash; hoist the
    # loop-invariant lane term and keep sd*P2 INCREMENTAL in is_ref row 2
    # (exact: uint32 mul distributes over the mod-2^32 adds), so each
    # bounce's draw needs only adds plus fmix32's two multiplies
    hlane = lane_row * kr_IN_P1  # [1, RT] uint32, loop-invariant
    amask_lo = jax.lax.bitcast_convert_type(amask_ref[0, :], u32)
    amask_hi = jax.lax.bitcast_convert_type(amask_ref[1, :], u32)
    acc_ref[...] = jnp.zeros((3, RT), jnp.float32)
    cnt_ref[...] = jnp.zeros((1, RT), jnp.int32)
    st_ref[...] = jnp.zeros((10, RT), jnp.float32)
    # is_ref rows: 0 = current sample index (S == exhausted), 1 = depth,
    # 2 = sd_term = ((sample0 + s) * 256 + d) * IN_P2 (uint32 bits)
    is_ref[...] = jnp.zeros((3, RT), jnp.int32)

    def sd_term(s, d):
        """((sample0 + s) << 8 | d) * IN_P2 in uint32 (d < 256)."""
        sd = ((sample0 + s) * 256 + d).astype(u32)
        return jax.lax.bitcast_convert_type(sd * kr_IN_P2, jnp.int32)

    def lsb_index(x):
        """Index of the lowest set bit (valid only where x != 0), via the
        float-exponent trick: isolate the lowest set bit, convert to f32
        (exact for powers of two), read the exponent. Mosaic can't convert
        uint32->f32, so route through an int32 bitcast and special-case
        bit 31."""
        low = x & (u32(0) - x)
        low_i = jax.lax.bitcast_convert_type(low, jnp.int32)
        f = low_i.astype(jnp.float32)
        expo = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127
        return jnp.where(low_i < 0, 31, expo)

    def next_alive(s_cur, first: bool):
        """First alive sample strictly after s_cur (>= 0 when first), over
        the TWO mask words (samples 0-31 in amask_lo, 32-63 in amask_hi).
        Exhausted lanes (s_cur >= S) get clamped garbage — discarded by the
        caller's `want` mask."""
        if first:
            rem_lo, rem_hi = amask_lo, amask_hi
            base_lo = jnp.int32(0)
            base_hi = jnp.int32(32)
        else:
            in_lo = s_cur < 32
            # two-step shift: each amount <= 31 (a single >> (s_cur+1)
            # would be UB at bit 31)
            sh_lo = jnp.minimum(s_cur, 31).astype(u32)
            rem_lo = jnp.where(in_lo, (amask_lo >> sh_lo) >> u32(1), u32(0))
            sh_hi = jnp.clip(s_cur - 32, 0, 31).astype(u32)
            rem_hi = jnp.where(in_lo, amask_hi, (amask_hi >> sh_hi) >> u32(1))
            base_lo = s_cur + 1
            base_hi = jnp.where(in_lo, 32, s_cur + 1)
        s_lo = base_lo + lsb_index(rem_lo)
        s_hi = base_hi + lsb_index(rem_hi)
        s_next = jnp.where(
            rem_lo != u32(0), s_lo,
            jnp.where(rem_hi != u32(0), s_hi, s_count),
        )
        return s_next

    # Padded sample stride of the row-major state segments: row r of sample
    # s lives at state0_ref[r * SP + s, :] (layout built by fused_passes_krng)
    SP = s_pad_samples

    def refill(first: bool, dummy_st=None):
        s_cur = is_ref[0, :]
        if first:
            want = jnp.full((RT,), True)
        else:
            want = (st_ref[9, :] == 0.0) & (s_cur < s_count)
        s_next = next_alive(s_cur, first)
        can = want & (s_next < s_count)
        target = st_ref if dummy_st is None else dummy_st
        # MASKED-SUM refill: one [SP, RT] one-hot of each lane's target
        # sample, then a static-sliced select+sum per state row. Replaces
        # the former dynamic-sliced block-copy fori whose trip count grew
        # with the cross-lane sample spread (measured 3.8 ms/pass on
        # suzanne at S=64 — the kernel's second-biggest per-iteration
        # cost). Fixed cost, no scalar loop, no dynamic slices; exact (the
        # mask is one-hot, so the sum IS the selected value).
        srow = jax.lax.broadcasted_iota(jnp.int32, (SP, RT), 0)
        m = (srow == s_next[None, :]) & can[None, :]
        for r in range(10):
            seg = state0_ref[r * SP : (r + 1) * SP, :]
            pick = jnp.sum(jnp.where(m, seg, 0.0), axis=0)
            target[r, :] = jnp.where(can, pick, target[r, :])
        if dummy_st is not None:
            return
        is_ref[0, :] = jnp.where(want, s_next, s_cur)
        is_ref[1, :] = jnp.where(can, 1, is_ref[1, :])
        is_ref[2, :] = jnp.where(can, sd_term(s_next, 1), is_ref[2, :])

    if resume:
        for r in range(10):
            st_ref[r, :] = resid_in_ref[r, :]
        is_ref[0, :] = resid_in_ref[10, :].astype(jnp.int32)
        is_ref[1, :] = resid_in_ref[11, :].astype(jnp.int32)
        is_ref[2, :] = sd_term(is_ref[0, :], is_ref[1, :])
    else:
        refill(first=True)

    # Per-lane iterations never exceed s_count * nb (a sample consumes one
    # iteration per shade event, depth 1..nb), so the replay residual
    # capacity of s_count * nb slots is exact; the non-replay bound keeps
    # its historical slack.
    max_iter = s_count * nb if replay else s_count * (nb + 1)

    def cond(carry):
        i, live = carry
        return (live >= max(thresh, 1)) & (i < max_iter)

    def one_bounce(it=None):
        ox, oy, oz = st_ref[0, :], st_ref[1, :], st_ref[2, :]
        dx, dy, dz = st_ref[3, :], st_ref[4, :], st_ref[5, :]
        bx, by, bz = st_ref[6, :], st_ref[7, :], st_ref[8, :]
        alive = st_ref[9, :] != 0.0
        s_cur = is_ref[0, :]
        d_cur = is_ref[1, :]
        cnt_ref[0, :] = cnt_ref[0, :] + alive.astype(jnp.int32)
        # guard_live: the while cond guarantees a live lane on loop entry,
        # so the any(live) early-out is a pure per-iteration reduction tax.
        # packed_winner: single-reduction winner select (krng stream is
        # statistically gated, so the 63-ulp t quantisation is admissible)
        intersect_tile(
            tri_ref, box_ref, box1_ref, sph_ref,
            ox, oy, oz, dx, dy, dz, alive, best_t_ref, best_i_ref,
            n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
            eps=eps, cull=cull, guard_live=_UNROLL > 1, packed_winner=True,
            skip_tris=stream,
        )
        if stream:
            # triangles streamed HBM->VMEM with window AABB skip; winner
            # attributes captured into attr_ref while resident
            _stream_tri(
                tri_ref, box_ref, win0_ref, win1_ref, sem0, sem1,
                ox, oy, oz, dx, dy, dz,
                best_t_ref, best_i_ref, attr_ref,
                n_windows=n_windows, eps=eps,
            )
        # slope profiling: PT3_SLOPE_DUP=intersect re-runs the (stateful,
        # self-reinitialising — identical result) intersect stage so its
        # per-iteration cost shows up as the bench-time delta
        if _SLOPE_DUP_INTERSECT:
            intersect_tile(
                tri_ref, box_ref, box1_ref, sph_ref,
                ox, oy, oz, dx, dy, dz, alive, best_t_ref, best_i_ref,
                n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
                eps=eps, cull=cull, guard_live=_UNROLL > 1, packed_winner=True,
            )
        t = best_t_ref[0, :]
        idx = best_i_ref[0, :]
        hit = alive & jnp.isfinite(t) & (t > 0.0)
        miss = alive & ~hit

        if replay:
            # One RRES-row residual block per iteration: the bounce's INPUT
            # state + winner record + (sample, depth) — everything the
            # backward needs (uniforms are recomputed from (lane, s, d)).
            # Dead lanes mark themselves with s == s_count so the reverse
            # walk skips them. 16-row blocks at 16-aligned dynamic offsets
            # (the sublane-alignment Mosaic lowers well).
            zrow = jnp.zeros((RT,), jnp.float32)
            rresid_ref[pl.ds(it * RRES, RRES), :] = jnp.stack([
                ox, oy, oz, dx, dy, dz, bx, by, bz,
                jnp.where(hit, t, _INF),
                jnp.where(hit, idx, 0).astype(jnp.float32),
                jnp.where(alive, s_cur, s_count).astype(jnp.float32),
                d_cur.astype(jnp.float32),
                zrow, zrow, zrow,
            ])

        mf = miss.astype(jnp.float32)
        acc_ref[0, :] = acc_ref[0, :] + mf * bx * env[0]
        acc_ref[1, :] = acc_ref[1, :] + mf * by * env[1]
        acc_ref[2, :] = acc_ref[2, :] + mf * bz * env[2]

        st_ref[9, :] = jnp.zeros((RT,), jnp.float32)

        @pl.when(jnp.bool_(True) if _NO_GUARDS else jnp.any(hit))
        def _shade():
            # premixed counter: hlane + sd_term == lane*P1 + sd*P2 of
            # kr.event_uniforms_rows, bit for bit
            base_row = hlane + jax.lax.bitcast_convert_type(
                is_ref[2:3, :], u32
            )
            u, v, p = kr.event_uniforms_premixed(base_row, seeds)
            # acos feeds only the glossy cone angle; statically dead when
            # the scene has no glossy material
            au = u if no_glossy else kr.acos01(u)
            if _SLOPE_DUP_KRNG:
                # perturbed input defeats CSE; results parked in dummy
                # scratch so DCE can't fold the duplicate away
                u2, v2, p2 = kr.event_uniforms_premixed(
                    base_row ^ u32(0x9E3779B9), seeds
                )
                au2 = kr.acos01(u2)
                dummy_st_ref[0, :] = u2
                dummy_st_ref[1, :] = v2
                dummy_st_ref[2, :] = p2
                dummy_st_ref[3, :] = au2
            if _SLOPE_DUP_SHADE:
                # dummy pass first: writes only scratch the real call
                # either re-zero-inits (attr via _gather) or overwrites
                dummy_st_ref[...] = jnp.zeros((10, RT), jnp.float32)
                _shade_tail(
                    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
                    dummy_acc_ref, attr_ref, dummy_st_ref,
                    t, idx, hit, ox, oy, oz, dx, dy, dz, bx, by, bz,
                    u, au, v, p,
                    n_tri=n_tri, n_sph=n_sph,
                    tcoef_pad=tcoef_pad, scoef_pad=scoef_pad,
                )
            _shade_tail(
                th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
                acc_ref, attr_ref, st_ref,
                t, idx, hit, ox, oy, oz, dx, dy, dz, bx, by, bz,
                u, au, v, p,
                n_tri=n_tri, n_sph=n_sph,
                tcoef_pad=tcoef_pad, scoef_pad=scoef_pad,
                no_glossy=no_glossy, tri_pregathered=stream,
            )
            d_new = jnp.where(hit, d_cur + 1, d_cur)
            is_ref[1, :] = d_new
            term = jax.lax.bitcast_convert_type(is_ref[2, :], u32)
            is_ref[2, :] = jax.lax.bitcast_convert_type(
                jnp.where(hit, term + kr_IN_P2, term), jnp.int32
            )
            st_ref[9, :] = jnp.where(d_new > nb, 0.0, st_ref[9, :])

        @pl.when(
            jnp.bool_(True)
            if _NO_GUARDS
            else jnp.any((st_ref[9, :] == 0.0) & (is_ref[0, :] < s_count))
        )
        def _():
            # slope profiling: a full dummy refill (same bounds, same block
            # copies, writes to dummy scratch) BEFORE the real one — its
            # delta is the refill COPY-LOOP cost the no-op probe misses
            if _SLOPE_DUP_REFILLCOPY:
                refill(first=False, dummy_st=dummy_st_ref)
            refill(first=False)
            # slope profiling: the second refill is an exact no-op (the
            # first leaves no lane wanting), so its cost delta ~= the
            # refill SCAN (next_alive + bounds; the copy loop zero-trips)
            if _SLOPE_DUP_REFILL:
                refill(first=False)

        return jnp.sum((st_ref[9, :] != 0.0).astype(jnp.int32))

    def body(carry):
        i, _ = carry
        # _UNROLL bounces per while iteration: amortises the loop's fixed
        # cost (guard reductions, live count, cond) over several bounces.
        # Extra bounces past exhaustion/threshold are masked no-ops and
        # per-lane accumulation order is unchanged, so results are
        # bit-identical at any unroll factor.
        live = one_bounce(i)
        for k in range(_UNROLL - 1):
            live = one_bounce(i + 1 + k)
        return i + _UNROLL, live

    live0 = jnp.sum((st_ref[9, :] != 0.0).astype(jnp.int32))
    final_i, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), live0))
    if replay:
        # realized iteration count (per-tile scalar, broadcast per lane)
        nit_ref[0, :] = jnp.zeros((RT,), jnp.int32) + final_i

    if thresh:
        # in-flight state for the compacted continuation dispatch; at loop
        # exit every lane is either alive or exhausted (refill runs inside
        # the body), so survivors are exactly the alive lanes
        for r in range(10):
            resid_out_ref[r, :] = st_ref[r, :]
        resid_out_ref[10, :] = is_ref[0, :].astype(jnp.float32)
        resid_out_ref[11, :] = is_ref[1, :].astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tri", "n_sph", "tcoef_pad", "scoef_pad", "eps", "cull", "nb",
        "s_count", "thresh", "interpret", "no_glossy", "stream", "replay",
    ),
)
def _run_regen_krng(
    tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl, misc,
    imisc, lane_ids, amask, state0, resid_in,
    n_tri, n_sph, tcoef_pad, scoef_pad, eps, cull, nb, s_count,
    thresh=0, interpret=False, no_glossy=False, stream=False, replay=False,
):
    resume = resid_in is not None
    r = state0.shape[1]
    t_pad = tri_tab.shape[0]
    s_pad = sph_tab.shape[0]
    n_windows = t_pad // WSTREAM if stream else 0
    kernel = functools.partial(
        _megakernel_regen_krng,
        n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
        tcoef_pad=tcoef_pad, scoef_pad=scoef_pad,
        eps=eps, cull=cull, nb=nb, s_count=s_count,
        s_pad_samples=state0.shape[0] // 10,
        thresh=thresh, resume=resume, no_glossy=no_glossy,
        stream=stream, n_windows=n_windows, replay=replay,
    )
    tab = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = lambda rows: pl.BlockSpec((rows, RT), lambda i: (0, i), memory_space=pltpu.VMEM)
    in_specs = [
        # stream mode: the triangle table stays in HBM (DMA'd in windows)
        pl.BlockSpec(memory_space=pltpu.ANY) if stream else tab((t_pad, 12)),
        tab((box_tab.shape[0], 8)),
        tab((box1_tab.shape[0], 8)),
        tab((s_pad, 8)),
        tab((TA, tcoef_pad)),
        tab((TA, tcoef_pad)),
        tab((TA, tcoef_pad)),
        tab((SA, scoef_pad)),
        tab((SA, scoef_pad)),
        tab((SA, scoef_pad)),
        tab((1, 8)),
        tab((1, 8)),
        lane(1), lane(2), lane(state0.shape[0]),
    ]
    args = [tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl,
            misc, imisc, lane_ids, amask, state0]
    if resume:
        in_specs.append(lane(12))
        args.append(resid_in)
    out_specs = [lane(3), lane(1)]
    out_shape = [
        jax.ShapeDtypeStruct((3, r), jnp.float32),
        jax.ShapeDtypeStruct((1, r), jnp.int32),
    ]
    if thresh:
        out_specs.append(lane(12))
        out_shape.append(jax.ShapeDtypeStruct((12, r), jnp.float32))
    if replay:
        nit_slots = s_count * nb
        out_specs += [lane(RRES * nit_slots), lane(1)]
        out_shape += [
            jax.ShapeDtypeStruct((RRES * nit_slots, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ]
    return pl.pallas_call(
        kernel,
        grid=(r // RT,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, RT), jnp.float32),
            pltpu.VMEM((1, RT), jnp.int32),
            pltpu.VMEM((TA, RT), jnp.float32),
            pltpu.VMEM((10, RT), jnp.float32),
            pltpu.VMEM((3, RT), jnp.int32),
        ]
        + (
            # ping/pong window buffers + one DMA semaphore each (the
            # double-buffered stream overlaps window w+1's fetch with
            # window w's chunk scan)
            [pltpu.VMEM((WSTREAM, 128), jnp.float32),
             pltpu.VMEM((WSTREAM, 128), jnp.float32),
             pltpu.SemaphoreType.DMA(()),
             pltpu.SemaphoreType.DMA(())]
            if stream
            else []
        )
        + (
            [pltpu.VMEM((3, RT), jnp.float32), pltpu.VMEM((10, RT), jnp.float32)]
            if (_SLOPE_DUP_SHADE or _SLOPE_DUP_REFILLCOPY or _SLOPE_DUP_KRNG)
            else []
        ),
        interpret=interpret,
    )(*args)


def fused_passes_krng(
    packed: PackedSceneFused,
    environment: jnp.ndarray,  # [3]
    state0: jnp.ndarray,  # [S*10, N]: rows (org3 dir3 beta3 alive1) per
    #                       sample (same layout as fused_passes)
    lane_ids: jnp.ndarray,  # [N] int32 canonical lane ids
    key_words: tuple,  # (k0, k1) uint32 scalars of the dispatch key
    sample0,  # traced int: global index of this dispatch's first sample
    eps: float,
    nb: int,
    s_count: int,
    cull: bool = False,
    interpret: bool = False,
    tail_frac: float = 0.0,
    tail_levels: int = 1,
    stream: bool = False,
    replay: bool = False,
):
    """Regenerating passes with in-kernel counter RNG. Same contract as
    fused_passes, but bounce uniforms are computed inside the kernel from
    (lane_id, sample0 + s, depth, key) — no uniform tables, no per-sample
    next-alive table (a two-word per-lane alive bitmask replaces it; s_count <= 64).
    The state table is transposed internally to ROW-MAJOR SEGMENTS
    ([10*SP, N], row r of sample s at r*SP + s) so the kernel's refill is a
    fixed-cost masked sum over static slices instead of a dynamic-sliced
    copy loop whose trip count grows with the cross-lane sample spread.

    ``tail_frac`` > 0 enables TAIL COMPACTION: the main dispatch stops each
    tile once its live lanes drop below tail_frac * RT (so per-tile
    survivors < tail_frac * RT by construction), survivors are packed
    ~1/tail_frac : 1 by a stable argsort inside the same jit, and ONE
    continuation dispatch finishes them at high occupancy. This attacks the
    residual regen waste — the stochastic spread of realized lane lifetimes
    that the feedback work-sort cannot predict (VALIDATION.md round 2:
    26% on suzanne vs a 0.1% clairvoyant oracle). Exact: per-lane results
    are position-independent, and the continuation resumes the identical
    in-flight state.
    """
    if s_count > S_COUNT_MAX:
        raise ValueError(
            f"krng regen supports at most {S_COUNT_MAX} fused passes, got {s_count}"
        )
    if replay and (tail_frac > 0.0 or stream):
        raise ValueError("replay residuals are incompatible with tail/stream")
    n = state0.shape[1]
    pad = (-n) % RT
    f32 = lambda x: x.astype(jnp.float32)
    if pad:
        state0 = jnp.concatenate(
            [f32(state0), jnp.zeros((state0.shape[0], pad), jnp.float32)],
            axis=1,
        )
        lane_ids = jnp.concatenate(
            [lane_ids.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
        )
    else:
        state0 = f32(state0)
        lane_ids = lane_ids.astype(jnp.int32)
    # row-major segment layout for the kernel's masked-sum refill: row r of
    # sample s at r*SP + s, SP = s_count padded to the 8-sublane tile
    sp_samples = -(-s_count // 8) * 8
    seg = state0.reshape(s_count, 10, state0.shape[1]).transpose(1, 0, 2)
    if sp_samples > s_count:
        seg = jnp.concatenate(
            [seg, jnp.zeros((10, sp_samples - s_count, seg.shape[2]),
                            jnp.float32)], axis=1,
        )
    state_seg = seg.reshape(10 * sp_samples, seg.shape[2])
    # per-lane alive bitmask from the per-sample alive rows — two 32-bit
    # words (samples 0-31 / 32-63), built in uint32 to keep bit 31 defined
    alive0 = state0[9::10, :] != 0.0  # [S, Npad]

    def _mask_word(lo: int) -> jnp.ndarray:
        nbits = min(s_count - lo, 32)
        if nbits <= 0:
            return jnp.zeros((state0.shape[1],), jnp.int32)
        w = (jnp.uint32(1) << jnp.arange(nbits, dtype=jnp.uint32))[:, None]
        word = jnp.sum(
            jnp.where(alive0[lo : lo + nbits], w, jnp.uint32(0)),
            axis=0, dtype=jnp.uint32,
        )
        return jax.lax.bitcast_convert_type(word, jnp.int32)

    amask = jnp.stack([_mask_word(0), _mask_word(32)])  # [2, Npad]
    misc = jnp.concatenate(
        [environment.astype(jnp.float32).reshape(3), jnp.zeros(5, jnp.float32)]
    ).reshape(1, 8)
    from . import kernel_rng

    i32c = lambda x: jax.lax.bitcast_convert_type(
        jnp.asarray(x, jnp.uint32), jnp.int32
    )
    seeds = kernel_rng.channel_seeds(
        jnp.asarray(key_words[0], jnp.uint32),
        jnp.asarray(key_words[1], jnp.uint32),
    ).reshape(3)
    imisc = jnp.stack(
        [i32c(key_words[0]), i32c(key_words[1]),
         jnp.asarray(sample0, jnp.int32),
         i32c(seeds[0]), i32c(seeds[1]), i32c(seeds[2]),
         jnp.int32(0), jnp.int32(0)]
    ).reshape(1, 8)
    do_cull = cull and packed.n_tri > 2 * TC and not stream
    sh, sm, sl = packed.sph_coef
    if stream:
        # HBM triangle table + window AABBs; the resident gather tables
        # are unused dummies (XLA dead-code-eliminates the real ones)
        tri_arg = packed.tri_all
        box_arg = packed.wbox
        box1_arg = jnp.zeros((8, 8), jnp.float32)
        dummy_coef = jnp.zeros((TA, TB), jnp.bfloat16)
        th = tm = tl = dummy_coef
        tcoef_pad = TB
    else:
        tri_arg = packed.tri_tab
        box_arg = packed.box_tab
        box1_arg = packed.box1_tab
        th, tm, tl = packed.tri_coef
        tcoef_pad = packed.tri_coef_pad
    npad = state0.shape[1]
    thresh = int(tail_frac * RT) if npad > RT else 0  # single tile: no gain
    lane_row = lane_ids.reshape(1, -1)
    amask_row = amask  # [2, Npad]
    run = functools.partial(
        _run_regen_krng,
        tri_arg, box_arg, box1_arg, packed.sph_tab,
        th, tm, tl, sh, sm, sl, misc,
    )
    common = dict(
        n_tri=packed.n_tri, n_sph=packed.n_sph,
        tcoef_pad=tcoef_pad, scoef_pad=packed.sph_coef_pad,
        eps=float(eps), cull=do_cull, nb=int(nb), s_count=int(s_count),
        interpret=interpret, no_glossy=getattr(packed, "no_glossy", False),
        stream=stream,
    )
    if thresh:
        # RECURSIVE tail compaction: every level except the last stops its
        # tiles at live < thresh and packs survivors (sorted by remaining
        # samples) into a geometrically smaller continuation dispatch; the
        # final level runs to exhaustion. Each level's pack gathers only
        # the survivors' columns, so the state re-gather cost is a
        # geometric series in n. Per-lane contributions are identical and
        # chronological; only the f32 SUMMATION GROUPING differs at level
        # boundaries (each level sums from zero, then the partial sums are
        # added) — measured <= a few ulp vs a single dispatch.
        # ``tail_levels`` counts CONTINUATIONS: levels=1 is the classic
        # main-dispatch + one packed continuation; each extra level packs
        # the previous continuation's own stragglers again.
        levels = max(int(tail_levels), 1)
        acc = cnt = None
        gidx = None  # survivor columns in ORIGINAL lane coordinates
        cur = (lane_row, amask_row, state_seg, None)
        level_n = npad
        for level in range(levels + 1):
            # per-tile survivor count is < thresh, so n_tiles * thresh
            # columns always suffice for the next level's pack
            n2 = (level_n // RT) * thresh
            n2 = min(-(-n2 // RT) * RT, level_n)
            last = level == levels or level_n <= RT or n2 >= level_n
            th_l = 0 if last else thresh
            out = run(imisc, *cur, thresh=th_l, **common)
            acc_l, cnt_l = out[0], out[1]
            if gidx is None:
                acc, cnt = acc_l, cnt_l
            else:
                acc = acc.at[:, gidx].add(acc_l)
                cnt = cnt.at[:, gidx].add(cnt_l)
            if last:
                break
            resid = out[2]
            alive = resid[9, :] != 0.0
            # continuation WORK-SORT: a continuation tile's while-loop is
            # bounded by its longest-lived lane, and a straggler's
            # remaining work is dominated by its remaining SAMPLES (s_cur
            # rides in resid row 10). Packing survivors by descending
            # remaining samples makes continuation tiles work-homogeneous
            # (the tail analogue of the feedback sort); dead lanes
            # (remaining -1) sort last, preserving the survivors-first
            # contract of n2.
            remaining = jnp.where(
                alive, s_count - resid[10, :].astype(jnp.int32), -1
            )
            idx2 = jnp.argsort(-remaining, stable=True)[:n2]
            gidx = idx2 if gidx is None else jnp.take(gidx, idx2)
            take2 = lambda a: jnp.take(a, idx2, axis=1)
            cur = (take2(cur[0]), take2(cur[1]), take2(cur[2]), take2(resid))
            level_n = n2
    elif replay:
        acc, cnt, rresid, nit = run(
            imisc, lane_row, amask_row, state_seg, None,
            thresh=0, replay=True, **common,
        )
        if pad:
            acc = acc[:, :n]
            cnt = cnt[:, :n]
        # rresid/nit stay PADDED (RT-aligned): regen_replay_bwd consumes
        # them tile-for-tile (padded lanes wrote s == s_count, so the
        # reverse walk skips them); the chain unpads its own outputs.
        return acc, cnt[0], rresid, nit
    else:
        acc, cnt = run(imisc, lane_row, amask_row, state_seg, None,
                       thresh=0, **common)
    if pad:
        acc = acc[:, :n]
        cnt = cnt[:, :n]
    return acc, cnt[0]


# ---------------------------------------------------------------------------
# Single-bounce kernel for the COMPACTING wavefront.
#
# The regenerating megakernel keeps a lane pinned to one (pixel, substratum):
# open scenes whose paths die by escaping to the environment (suzanne: mean
# path lifetime 1.23 of 4 bounces) leave each tile's while-loop bounded by
# its longest-lived lane — 62% dispatched waste at S=8
# (tools/measure_waste.py). A single dispatch's realized lifetimes are RNG
# noise, but their per-lane EXPECTATION is geometry and carries across
# dispatches (corr 0.96) — the shipped cure is the FEEDBACK WORK-SORT
# (models/integrator.trace_passes_fused sort_key), which re-sorts lanes by
# the accumulated counts of earlier dispatches (suzanne waste 57% -> 26%).
# The classic wavefront answer (SURVEY section 7 phase 2c) is stream
# compaction: between bounces, XLA argsort+gather packs live lanes densely,
# so every dispatched tile is fully live and trailing all-dead tiles skip
# their body under pl.when. This kernel is one bounce of
# models/integrator.bounce with path state [13, RT] = org3 dir3 beta3
# alive1 acc3 flowing in -> out; the radiance accumulator rides IN the
# state so compaction permutes it for free and only one scatter (at the
# end of the chain) is needed.
#
# MEASURED OUTCOME (v5e, 256^2 K16 depth5, S=8): compaction LOSES to the
# regenerating megakernel — 207 vs 28 ms/pass (cornell), 228 vs 80
# (suzanne), 202 vs 9 (ce). The [13, N] argsort+gather per bounce plus
# per-bounce HBM round-trips of the whole path state swamp the dead-lane
# savings, while regen amortizes them inside one dispatch. Kept as the
# exactness-tested reference implementation of classic compaction
# (tests/test_megakernel.py, tests_tpu/test_tpu_smoke.py); regen remains
# the production path (models/render.make_pass_fn). See VALIDATION.md.
# ---------------------------------------------------------------------------


def _bounce_kernel(
    tri_ref, box_ref, box1_ref, sph_ref,
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
    misc_ref,  # [1, 8] f32: env r, g, b
    state_in_ref,  # [13, RT]: org3 dir3 beta3 alive1 acc3
    unif_ref,  # [4, RT]: (u, acos u, v, p) for THIS bounce
    state_ref,  # [13, RT] out (also the working state)
    cnt_ref,  # [1, RT] out int32: 1 where the lane was live this bounce
    *rest,  # [t_out_ref, i_out_ref if emit_hit] best_t_ref best_i_ref attr_ref
    n_tri, n_sph, t_pad, s_pad, tcoef_pad, scoef_pad, eps, cull,
    emit_hit: bool = False,
):
    if emit_hit:
        # winner record for the path-replay backward (models/replay.py):
        # t (+inf on miss/dead) and the packed primitive index
        t_out_ref, i_out_ref = rest[0], rest[1]
        rest = rest[2:]
    best_t_ref, best_i_ref, attr_ref = rest
    env = (misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2])
    state_ref[...] = state_in_ref[...]
    alive = state_ref[9, :] != 0.0
    cnt_ref[...] = alive.astype(jnp.int32).reshape(1, RT)
    if emit_hit:
        t_out_ref[...] = jnp.full((1, RT), _INF, jnp.float32)
        i_out_ref[...] = jnp.zeros((1, RT), jnp.int32)

    @pl.when(jnp.any(alive))
    def _():
        ox, oy, oz = state_ref[0, :], state_ref[1, :], state_ref[2, :]
        dx, dy, dz = state_ref[3, :], state_ref[4, :], state_ref[5, :]
        bx, by, bz = state_ref[6, :], state_ref[7, :], state_ref[8, :]
        # guard_live=False: this block already runs under pl.when(any(alive))
        intersect_tile(
            tri_ref, box_ref, box1_ref, sph_ref,
            ox, oy, oz, dx, dy, dz, alive, best_t_ref, best_i_ref,
            n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
            eps=eps, cull=cull, guard_live=False,
        )
        t = best_t_ref[0, :]
        idx = best_i_ref[0, :]
        hit = alive & jnp.isfinite(t) & (t > 0.0)
        miss = alive & ~hit
        if emit_hit:
            t_out_ref[...] = jnp.where(hit, t, _INF).reshape(1, RT)
            i_out_ref[...] = jnp.where(hit, idx, 0).reshape(1, RT)

        # environment on miss (Renderer.cpp:66-67)
        mf = miss.astype(jnp.float32)
        state_ref[10, :] = state_ref[10, :] + mf * bx * env[0]
        state_ref[11, :] = state_ref[11, :] + mf * by * env[1]
        state_ref[12, :] = state_ref[12, :] + mf * bz * env[2]

        state_ref[9, :] = jnp.zeros((RT,), jnp.float32)

        @pl.when(jnp.any(hit))
        def _shade():
            _shade_tail(
                th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
                state_ref, attr_ref, state_ref,
                t, idx, hit, ox, oy, oz, dx, dy, dz, bx, by, bz,
                unif_ref[0, :], unif_ref[1, :], unif_ref[2, :],
                unif_ref[3, :],
                n_tri=n_tri, n_sph=n_sph,
                tcoef_pad=tcoef_pad, scoef_pad=scoef_pad, acc_base=10,
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tri", "n_sph", "tcoef_pad", "scoef_pad", "eps", "cull",
        "interpret", "emit_hit",
    ),
)
def _run_bounce(
    tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl, misc,
    state, unif,
    n_tri, n_sph, tcoef_pad, scoef_pad, eps, cull, interpret=False,
    emit_hit=False,
):
    r = state.shape[1]
    t_pad = tri_tab.shape[0]
    s_pad = sph_tab.shape[0]
    kernel = functools.partial(
        _bounce_kernel,
        n_tri=n_tri, n_sph=n_sph, t_pad=t_pad, s_pad=s_pad,
        tcoef_pad=tcoef_pad, scoef_pad=scoef_pad, eps=eps, cull=cull,
        emit_hit=emit_hit,
    )
    tab = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = lambda rows: pl.BlockSpec((rows, RT), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(r // RT,),
        in_specs=[
            tab((t_pad, 12)),
            tab((box_tab.shape[0], 8)),
            tab((box1_tab.shape[0], 8)),
            tab((s_pad, 8)),
            tab((TA, tcoef_pad)),
            tab((TA, tcoef_pad)),
            tab((TA, tcoef_pad)),
            tab((SA, scoef_pad)),
            tab((SA, scoef_pad)),
            tab((SA, scoef_pad)),
            tab((1, 8)),
            lane(13), lane(4),
        ],
        out_specs=[lane(13), lane(1)]
        + ([lane(1), lane(1)] if emit_hit else []),
        out_shape=[
            jax.ShapeDtypeStruct((13, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ]
        + (
            [
                jax.ShapeDtypeStruct((1, r), jnp.float32),
                jax.ShapeDtypeStruct((1, r), jnp.int32),
            ]
            if emit_hit
            else []
        ),
        scratch_shapes=[
            pltpu.VMEM((1, RT), jnp.float32),
            pltpu.VMEM((1, RT), jnp.int32),
            pltpu.VMEM((TA, RT), jnp.float32),
        ],
        interpret=interpret,
    )(tri_tab, box_tab, box1_tab, sph_tab, th, tm, tl, sh, sm, sl, misc,
      state, unif)


def bounce_step(
    packed: PackedSceneFused,
    environment: jnp.ndarray,  # [3]
    state: jnp.ndarray,  # [13, N]: org3 dir3 beta3 alive1 acc3 (f32)
    unif: jnp.ndarray,  # [4, N]: (u, acos u, v, p) for this bounce
    eps: float,
    cull: bool = False,
    interpret: bool = False,
    with_hit: bool = False,
):
    """One wavefront bounce. Returns (state' [13, N], live_mask_count [N])
    — plus (t [N] winner distance (+inf miss), packed idx [N]) when
    ``with_hit`` (the residuals the path-replay backward needs to rebuild
    shading inputs without re-intersecting, models/replay.py).

    ``cull`` defaults OFF: see fused_bounces — per-leaf culling measured
    as a net loss on incoherent bounce-ray tiles (VALIDATION.md)."""
    n = state.shape[1]
    pad = (-n) % RT
    f32 = lambda x: x.astype(jnp.float32)
    if pad:
        state = jnp.concatenate(
            [f32(state), jnp.zeros((state.shape[0], pad), jnp.float32)],
            axis=1,
        )
        unif = jnp.concatenate(
            [f32(unif), jnp.zeros((unif.shape[0], pad), jnp.float32)], axis=1
        )
    else:
        state, unif = f32(state), f32(unif)
    misc = jnp.concatenate(
        [environment.astype(jnp.float32).reshape(3), jnp.zeros(5, jnp.float32)]
    ).reshape(1, 8)
    do_cull = cull and packed.n_tri > 2 * TC
    th, tm, tl = packed.tri_coef
    sh, sm, sl = packed.sph_coef
    res = _run_bounce(
        packed.tri_tab, packed.box_tab, packed.box1_tab, packed.sph_tab,
        th, tm, tl, sh, sm, sl, misc, state, unif,
        packed.n_tri, packed.n_sph,
        packed.tri_coef_pad, packed.sph_coef_pad,
        float(eps), do_cull, interpret, with_hit,
    )
    if pad:
        res = [r[:, :n] for r in res]
    out, cnt = res[0], res[1]
    if with_hit:
        return out, cnt[0], res[2][0], res[3][0]
    return out, cnt[0]


# ---------------------------------------------------------------------------
# BACKWARD bounce kernel for the path-replay training path (models/replay.py).
#
# The replay backward evaluates the VJP of one shading bounce at the SAVED
# boundary state and winner (t, idx). Done in XLA, each bounce costs several
# [rows, Tpad] x [Tpad, N] one-hot gathers plus their transposes, all
# round-tripping HBM — the dominant term of the training step (VALIDATION
# round 3: 512^2 replay bwd ~244 ms of 556). This kernel runs the SAME
# mathematics per ray tile entirely in VMEM: the bounce tail is written as
# a pure jnp function `f` of (state, attribute tables, env, t) and its VJP
# is obtained by jax.vjp AT TRACE TIME inside the kernel body (the
# transposed ops lower to Mosaic like any other jnp), so forward remat and
# backward never leave VMEM. Winner-distance cotangents convert to ray
# cotangents with the same implicit-function-theorem formula as the
# forward kernel's custom VJP (pallas_intersect._kernel_tx_bwd).
#
# Outputs: the input-state cotangent per lane, plus d(attribute table) /
# d(env) ACCUMULATED across the sequential grid (TPU grid steps execute in
# order; the blocks map to (0, 0) and are zero-initialised at program 0).
# Geometry rows of d(table) (woop + vertex normals) are discarded by the
# caller — geometry is detached by design, matching the XLA replay path.
# Material rows map back to d(materials) with one small segment-sum by
# mat_id on the host side (models/replay.py).
# ---------------------------------------------------------------------------


# Lane tile of the BACKWARD bounce kernel. The vjp-traced body carries far
# more simultaneously-live [*, lanes] vectors than the forward kernels, and
# at RT=1024 the current toolchain's scoped-VMEM accounting rejects it
# (22.15 MiB vs the 16 MiB limit — round-4 root cause; the round-3 binary
# shipped from the committed compile cache and was never re-lowered).
# 512 lanes halves the peak (~11 MiB, fits) at half the per-program
# fixed-cost multiplication of 256.
RTB = 512


def _gather_hp_impl(tab, sel, n_pad, block):
    """Blocked one-hot gather, f32 HIGHEST precision (pure jnp)."""
    acc = None
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, RTB), 0)
    for blk in range(n_pad // block):
        oh = (rows == (sel - blk * block)).astype(jnp.float32)
        part = jnp.dot(
            tab[:, blk * block : (blk + 1) * block], oh,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = part if acc is None else acc + part
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_hp(tab, sel, n_pad, block):
    """_gather_hp_impl with a REBUILD-the-one-hot backward: jax's automatic
    transpose saves every [block, RTB] f32 one-hot as a residual, and those
    saves alone blow the bwd kernel past the 16 MiB scoped-VMEM limit
    under the current toolchain (22.5 MiB; round-4 root-cause — the
    round-3 binary shipped from the committed compile cache and never
    re-lowered). Here the backward keeps only ``sel`` ([1, RTB] int32) and
    reconstructs each block's one-hot; the transposed matmul is the
    identical dot_general jax itself would emit, so gradients are
    unchanged bit for bit."""
    return _gather_hp_impl(tab, sel, n_pad, block)


def _gather_hp_fwd(tab, sel, n_pad, block):
    return _gather_hp_impl(tab, sel, n_pad, block), sel


def _gather_hp_bwd(n_pad, block, sel, g):
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, RTB), 0)
    parts = []
    for blk in range(n_pad // block):
        oh = (rows == (sel - blk * block)).astype(jnp.float32)
        parts.append(
            jax.lax.dot_general(
                g, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    return jnp.concatenate(parts, axis=1), None


_gather_hp.defvjp(_gather_hp_fwd, _gather_hp_bwd)


def _bounce_bwd_kernel(
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
    misc_ref,  # [1, 8] f32: env r, g, b
    state_ref,  # [13, RTB] saved INPUT state (org3 dir3 beta3 alive1 acc3)
    t_ref,  # [1, RTB] saved winner t (+inf miss)
    i_ref,  # [1, RTB] saved packed winner index
    unif_ref,  # [4, RTB] (u, acos u, v, p)
    cot_out_ref,  # [13, RTB] cotangent of the OUTPUT state
    cot_in_ref,  # [13, RTB] out: cotangent of the INPUT state
    dtri_ref,  # [TA, tcoef_pad] f32 out: d(tri attr table), accumulated
    dsph_ref,  # [SA, scoef_pad] f32 out: d(sph attr table), accumulated
    denv_ref,  # [1, 8] f32 out: d(environment), accumulated
    *,
    n_tri, n_sph, tcoef_pad, scoef_pad, eps,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dtri_ref[...] = jnp.zeros_like(dtri_ref)
        dsph_ref[...] = jnp.zeros_like(dsph_ref)
        denv_ref[...] = jnp.zeros_like(denv_ref)

    st = state_ref[...]
    t_saved = t_ref[0, :]
    idx = i_ref[0, :]
    u = unif_ref[0, :]
    acos_u = unif_ref[1, :]
    v = unif_ref[2, :]
    p_ev = unif_ref[3, :]
    alive = st[9, :] != 0.0

    # DEAD-TILE SKIP: on an all-dead tile the bounce map is the identity
    # on state rows 0..12 (hit is false everywhere, mf == 0) except the
    # alive row, which is forced to 0 — so the exact input cotangent is
    # the output cotangent with row 9 zeroed, and the table/env gradients
    # are untouched. With the liveness sort (models/replay.py) roughly
    # half of an open scene's tiles take this branch.
    any_alive = jnp.any(alive)

    @pl.when(jnp.logical_not(any_alive))
    def _dead_tile():
        c = cot_out_ref[...]
        cot_in_ref[...] = c
        cot_in_ref[9, :] = jnp.zeros((RTB,), jnp.float32)

    @pl.when(any_alive)
    def _live_tile():
        _bounce_bwd_body(
            th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref, misc_ref,
            st, t_saved, idx, u, acos_u, v, p_ev, alive,
            cot_out_ref, cot_in_ref, dtri_ref, dsph_ref, denv_ref,
            n_tri=n_tri, n_sph=n_sph, tcoef_pad=tcoef_pad,
            scoef_pad=scoef_pad, eps=eps,
        )


def _bounce_bwd_body(
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref, misc_ref,
    st, t_saved, idx, u, acos_u, v, p_ev, alive,
    cot_out_ref, cot_in_ref, dtri_ref, dsph_ref, denv_ref,
    *, n_tri, n_sph, tcoef_pad, scoef_pad, eps,
):
    hit = alive & jnp.isfinite(t_saved) & (t_saved > 0.0)
    t_c = jnp.where(hit, t_saved, 0.0)  # nondiff clamp of the saved t
    tri_win = hit & (idx < n_tri)
    sph_win = hit & ~tri_win

    # exact f32 attribute tables (bf16x3 recombined) as VJP inputs (dummy
    # zeros when a primitive kind is absent — keeps the vjp arity fixed)
    TH = (
        th_ref[...].astype(jnp.float32)
        + tm_ref[...].astype(jnp.float32)
        + tl_ref[...].astype(jnp.float32)
    )
    SH = (
        sh_ref[...].astype(jnp.float32)
        + sm_ref[...].astype(jnp.float32)
        + sl_ref[...].astype(jnp.float32)
    )
    env_in = misc_ref[...]

    sel_t = jnp.where(tri_win, idx, -1).reshape(1, RTB)
    sel_s = jnp.where(sph_win, idx - n_tri, -1).reshape(1, RTB)

    # blocked one-hot gather, f32 HIGHEST precision (bf16 passes would
    # round the gathered attributes AND the transposed cotangents ~0.4%
    # rel — the measured gradient-parity gap vs the XLA backward), with a
    # rebuild-the-one-hot custom VJP so the residuals stay tiny (see
    # _gather_hp)
    gather = _gather_hp

    def f(st, TH, SH, env_row, t):
        ox, oy, oz = st[0, :], st[1, :], st[2, :]
        dx, dy, dz = st[3, :], st[4, :], st[5, :]
        bx, by, bz = st[6, :], st[7, :], st[8, :]
        env = (env_row[0, 0], env_row[0, 1], env_row[0, 2])
        mf = (alive & ~hit).astype(jnp.float32)
        acc0 = st[10, :] + mf * bx * env[0]
        acc1 = st[11, :] + mf * by * env[1]
        acc2 = st[12, :] + mf * bz * env[2]

        px_ = ox + t * dx
        py_ = oy + t * dy
        pz_ = oz + t * dz

        if n_tri > 0:
            a = gather(TH, sel_t, tcoef_pad, TB)  # [TA, RTB]
            o_u = a[0] * ox + a[1] * oy + a[2] * oz + a[3]
            o_v = a[4] * ox + a[5] * oy + a[6] * oz + a[7]
            d_u = a[0] * dx + a[1] * dy + a[2] * dz
            d_v = a[4] * dx + a[5] * dy + a[6] * dz
            d_w = a[8] * dx + a[9] * dy + a[10] * dz
            uu = o_u + t * d_u
            vv = o_v + t * d_v
            inx = a[12] + uu * (a[15] - a[12]) + vv * (a[18] - a[12])
            iny = a[13] + uu * (a[16] - a[13]) + vv * (a[19] - a[13])
            inz = a[14] + uu * (a[17] - a[14]) + vv * (a[20] - a[14])
            # non-tri lanes gathered all-zero rows: normalise(0) has inf
            # partials (inv^3) that where() would NOT stop in the backward
            # — substitute a unit vector on the untaken lanes
            inx = jnp.where(tri_win, inx, 1.0)
            iny = jnp.where(tri_win, iny, 0.0)
            inz = jnp.where(tri_win, inz, 0.0)
            inx, iny, inz = _normalise3(inx, iny, inz)
            flip_t = jnp.where(d_w > 0.0, -1.0, 1.0)
            tn = (inx * flip_t, iny * flip_t, inz * flip_t)
            t_mat = (a[21], a[22], a[23], a[24], a[25], a[26], a[27],
                     a[28], a[29])
            t_inside = d_w > 0.0
        if n_sph > 0:
            s = gather(SH, sel_s, scoef_pad, min(TB, scoef_pad))
            # same inf-partial guard for the untaken sphere branch
            snx, sny, snz = _normalise3(
                jnp.where(sph_win, px_ - s[0], 1.0),
                jnp.where(sph_win, py_ - s[1], 0.0),
                jnp.where(sph_win, pz_ - s[2], 0.0),
            )
            s_inside = snx * dx + sny * dy + snz * dz > 0.0
            flip_s = jnp.where(s_inside, -1.0, 1.0)
            sn = (snx * flip_s, sny * flip_s, snz * flip_s)
            s_mat = (s[3], s[4], s[5], s[6], s[7], s[8], s[9], s[10], s[11])

        if n_tri > 0 and n_sph > 0:
            tw = tri_win
            nx, ny, nz = (jnp.where(tw, tn[c], sn[c]) for c in range(3))
            m = tuple(jnp.where(tw, t_mat[c], s_mat[c]) for c in range(9))
            inside = (tw & t_inside) | (~tw & s_inside)
        elif n_tri > 0:
            nx, ny, nz = tn
            m = t_mat
            inside = t_inside
        else:
            nx, ny, nz = sn
            m = s_mat
            inside = s_inside
        emr, emg, emb, dir_, dig, dib, ior, refl0, cone = m
        # miss lanes gathered all-zero attributes (sel == -1); ior == 0 and
        # a zero normal would put 0/0 NaNs on the un-selected sides of the
        # jnp.where's below, and where() does NOT stop NaN gradients —
        # sanitise the two division feeders on non-hit lanes
        ior = jnp.where(hit, ior, 1.0)

        hf = hit.astype(jnp.float32)
        acc0 = acc0 + hf * bx * emr
        acc1 = acc1 + hf * by * emg
        acc2 = acc2 + hf * bz * emb

        ior_from = jnp.where(inside, ior, 1.0)
        ior_to = jnp.where(inside, 1.0, ior)
        ratio = ior_from / ior_to
        cos_i = -(dx * nx + dy * ny + dz * nz)
        cos_i = jnp.where(hit, cos_i, 1.0)
        sin_t_sq = ratio * ratio * (1.0 - cos_i * cos_i)
        # double-where sqrt clamp (vecmath.safe_sqrt): sqrt'(0) = inf would
        # otherwise poison the backward through the UNTAKEN where branch
        # (total-internal-reflection lanes, and fixed-reflectivity winners
        # whose fresnel value is never even selected)
        ct_pos = 1.0 - sin_t_sq > 0.0
        cos_t = jnp.where(
            ct_pos, jnp.sqrt(jnp.where(ct_pos, 1.0 - sin_t_sq, 1.0)), 0.0
        )
        # denominator guard (see vecmath.reflectance): exact-grazing TIR
        # boundary is 0/0 whose NaN partials leak through zero cotangents
        den_f = ior_from * cos_i + ior_to * cos_t
        ok_f = den_f > 0.0
        r_perp = jnp.where(
            ok_f,
            (ior_from * cos_i - ior_to * cos_t) / jnp.where(ok_f, den_f, 1.0),
            1.0,
        )
        fresnel = jnp.where(sin_t_sq > 1.0, 1.0, r_perp * r_perp)
        refl = jnp.where(refl0 < 0.0, fresnel, refl0)
        spec = p_ev < refl

        rdot = 2.0 * (dx * nx + dy * ny + dz * nz)
        rx, ry, rz = dx - nx * rdot, dy - ny * rdot, dz - nz * rdot
        # hit lanes have |r| == |d| == 1; PAD lanes carry d == 0, so r == 0
        # and the ONB/normalise chain below would emit inf partials that
        # NaN-poison the gather transpose (0 * inf) — substitute a unit r
        rx = jnp.where(hit, rx, 1.0)
        ry = jnp.where(hit, ry, 0.0)
        rz = jnp.where(hit, rz, 0.0)
        theta = cone * (1.0 - 2.0 * acos_u / math.pi)
        cradius = jnp.sin(theta)
        cz_scale = jnp.cos(theta)
        rth = v * (2.0 * math.pi)
        (cxx, cxy, cxz), (cyx, cyy, cyz) = _onb_from_z(rx, ry, rz)
        lx = jnp.cos(rth) * cradius
        ly = jnp.sin(rth) * cradius
        sx = cxx * lx + cyx * ly + rx * cz_scale
        sy = cxy * lx + cyy * ly + ry * cz_scale
        sz = cxz * lx + cyz * ly + rz * cz_scale
        sx, sy, sz = _normalise3(sx, sy, sz)
        mirror = cone < EPSILON
        conex = jnp.where(mirror, rx, sx)
        coney = jnp.where(mirror, ry, sy)
        conez = jnp.where(mirror, rz, sz)

        (hxx, hxy, hxz), (hyx, hyy, hyz) = _onb_from_z(nx, ny, nz)
        hth = (2.0 * math.pi) * u
        hr = jnp.sqrt(jnp.maximum(v, 0.0))
        hlx = jnp.cos(hth) * hr
        hly = jnp.sin(hth) * hr
        hlz = jnp.sqrt(jnp.maximum(1.0 - v, 0.0))
        hx = hxx * hlx + hyx * hly + nx * hlz
        hy = hxy * hlx + hyy * hly + ny * hlz
        hz = hxz * hlx + hyz * hly + nz * hlz
        hx, hy, hz = _normalise3(hx, hy, hz)

        ndx = jnp.where(spec, conex, hx)
        ndy = jnp.where(spec, coney, hy)
        ndz = jnp.where(spec, conez, hz)

        # likelihood-ratio branch weight (primal exactly 1): the pdf-
        # derivative term for the discrete event — integrator.branch_weight
        refl_hat = jax.lax.stop_gradient(refl)
        w = jnp.where(
            spec,
            refl / jnp.maximum(refl_hat, 1e-12),
            (1.0 - refl) / jnp.maximum(1.0 - refl_hat, 1e-12),
        )
        sf = spec.astype(jnp.float32)
        nbx = bx * (sf + (1.0 - sf) * dir_) * w
        nby = by * (sf + (1.0 - sf) * dig) * w
        nbz = bz * (sf + (1.0 - sf) * dib) * w

        rows = [
            jnp.where(hit, px_, ox),
            jnp.where(hit, py_, oy),
            jnp.where(hit, pz_, oz),
            jnp.where(hit, ndx, dx),
            jnp.where(hit, ndy, dy),
            jnp.where(hit, ndz, dz),
            jnp.where(hit, nbx, bx),
            jnp.where(hit, nby, by),
            jnp.where(hit, nbz, bz),
            jnp.zeros((RTB,), jnp.float32),  # alive: nondiff
            acc0,
            acc1,
            acc2,
        ]
        return jnp.stack(rows)

    _, vjp = jax.vjp(f, st, TH, SH, env_in, t_c)
    d_st, d_TH, d_SH, d_env, d_t = vjp(cot_out_ref[...])

    # winner-t cotangent -> ray cotangents (implicit function theorem,
    # same formula as pallas_intersect._kernel_tx_bwd): g = winner's
    # unnormalised geometric normal
    if n_tri > 0:
        at = gather(TH, sel_t, tcoef_pad, TB)
        g_tri = (at[8], at[9], at[10])
    else:
        g_tri = (jnp.zeros((RTB,), jnp.float32),) * 3
    if n_sph > 0:
        ssp = gather(SH, sel_s, scoef_pad, min(TB, scoef_pad))
        g_sph = (
            st[0, :] + t_c * st[3, :] - ssp[0],
            st[1, :] + t_c * st[4, :] - ssp[1],
            st[2, :] + t_c * st[5, :] - ssp[2],
        )
    else:
        g_sph = (jnp.zeros((RTB,), jnp.float32),) * 3
    gx = jnp.where(tri_win, g_tri[0], g_sph[0])
    gy = jnp.where(tri_win, g_tri[1], g_sph[1])
    gz = jnp.where(tri_win, g_tri[2], g_sph[2])
    gd = gx * st[3, :] + gy * st[4, :] + gz * st[5, :]
    inv = jnp.where(jnp.abs(gd) > 1e-20, 1.0 / jnp.where(gd == 0.0, 1.0, gd), 0.0)
    scale = jnp.where(hit, -d_t * inv, 0.0)
    zero = jnp.zeros((RTB,), jnp.float32)
    # stacked row add (a .at[row].add would lower to scatter-add, which
    # Mosaic does not implement)
    d_st = d_st + jnp.stack(
        [gx * scale, gy * scale, gz * scale,
         gx * scale * t_c, gy * scale * t_c, gz * scale * t_c,
         zero, zero, zero, zero, zero, zero, zero]
    )
    cot_in_ref[...] = d_st
    if n_tri > 0:
        dtri_ref[...] = dtri_ref[...] + d_TH
    if n_sph > 0:
        dsph_ref[...] = dsph_ref[...] + d_SH
    denv_ref[...] = denv_ref[...] + d_env


@functools.partial(
    jax.jit,
    static_argnames=("n_tri", "n_sph", "tcoef_pad", "scoef_pad", "eps",
                     "interpret"),
)
def _run_bounce_bwd(
    th, tm, tl, sh, sm, sl, misc, state, t, idx, unif, cot_out,
    n_tri, n_sph, tcoef_pad, scoef_pad, eps, interpret=False,
):
    r = state.shape[1]
    kernel = functools.partial(
        _bounce_bwd_kernel,
        n_tri=n_tri, n_sph=n_sph,
        tcoef_pad=tcoef_pad, scoef_pad=scoef_pad, eps=eps,
    )
    tab = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = lambda rows: pl.BlockSpec((rows, RTB), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(r // RTB,),
        in_specs=[
            tab((TA, tcoef_pad)), tab((TA, tcoef_pad)), tab((TA, tcoef_pad)),
            tab((SA, scoef_pad)), tab((SA, scoef_pad)), tab((SA, scoef_pad)),
            tab((1, 8)),
            lane(13), lane(1), lane(1), lane(4), lane(13),
        ],
        out_specs=[
            lane(13),
            tab((TA, tcoef_pad)),
            tab((SA, scoef_pad)),
            tab((1, 8)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((13, r), jnp.float32),
            jax.ShapeDtypeStruct((TA, tcoef_pad), jnp.float32),
            jax.ShapeDtypeStruct((SA, scoef_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        interpret=interpret,
    )(th, tm, tl, sh, sm, sl, misc, state, t, idx, unif, cot_out)


def bounce_bwd_step(
    packed: PackedSceneFused,
    environment: jnp.ndarray,  # [3]
    state: jnp.ndarray,  # [13, N] saved input state
    t: jnp.ndarray,  # [N] saved winner distance
    idx: jnp.ndarray,  # [N] saved packed winner index
    unif: jnp.ndarray,  # [4, N]
    cot_out: jnp.ndarray,  # [13, N] output-state cotangent
    eps: float,
    interpret: bool = False,
):
    """VJP of one replay bounce, fused in VMEM. Returns
    (cot_in [13, N], d_tri_table [TA, tcoef_pad], d_sph_table
    [SA, scoef_pad], d_env [3]) — table gradients are per PRIMITIVE
    column; the caller maps material rows back to the material table by
    mat_id and discards the geometry rows (detached by design)."""
    n = state.shape[1]
    pad = (-n) % RTB
    f32 = lambda x: x.astype(jnp.float32)
    if pad:
        z = lambda rows: jnp.zeros((rows, pad), jnp.float32)
        state = jnp.concatenate([f32(state), z(13)], axis=1)
        cot_out = jnp.concatenate([f32(cot_out), z(13)], axis=1)
        unif = jnp.concatenate([f32(unif), z(4)], axis=1)
        t = jnp.concatenate([f32(t), jnp.full((pad,), _INF, jnp.float32)])
        idx = jnp.concatenate([idx.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)])
    else:
        state, cot_out, unif = f32(state), f32(cot_out), f32(unif)
        t, idx = f32(t), idx.astype(jnp.int32)
    misc = jnp.concatenate(
        [environment.astype(jnp.float32).reshape(3), jnp.zeros(5, jnp.float32)]
    ).reshape(1, 8)
    th, tm, tl = packed.tri_coef
    sh, sm, sl = packed.sph_coef
    cot_in, d_tri, d_sph, d_env = _run_bounce_bwd(
        th, tm, tl, sh, sm, sl, misc,
        state, t.reshape(1, -1), idx.reshape(1, -1), unif, cot_out,
        packed.n_tri, packed.n_sph,
        packed.tri_coef_pad, packed.sph_coef_pad,
        float(eps), interpret,
    )
    if pad:
        cot_in = cot_in[:, :n]
    return cot_in, d_tri, d_sph, d_env[0, :3]


# ---------------------------------------------------------------------------
# REGENERATING path-replay backward.
#
# The round-4 replay forward ran all nb bounces for every lane (mean path
# lifetime 1.23 of nb=4 on suzanne — ~70% dead work) and its backward
# swept nb dense bounce_bwd_step dispatches. The regen replay forward
# (fused_passes_krng(replay=True)) instead records one residual slot per
# REALIZED kernel iteration — a lane that dies refills with the next
# sample's first bounce inside the dispatch — so both directions now walk
# only realized (lane, bounce) events. This kernel is the reverse walk:
#
#   for j = n_it-1 .. 0 (n_it = the forward tile's realized iterations):
#     residual slot j holds (input state, winner t/idx, sample s, depth d)
#     * a lane whose s changed since slot j+1 ended a sample segment in
#       the forward -> RESET its running state cotangent (rows 0..8 to 0;
#       acc rows to acc_bar, which is SAMPLE-INDEPENDENT: the loss is
#       linear in the per-sample radiance sum, so every sample of a lane
#       shares one acc cotangent)
#     * uniforms are recomputed from (lane, sample0+s, d) with the same
#       counter RNG as the forward — no uniform residuals exist
#     * the shading VJP body is _bounce_bwd_body (identical linearisation
#       to bounce_bwd_step, LR branch weight included)
#     * at a segment START (d == 1) the input-state cotangent is scattered
#       into the per-sample d_state0 table for the XLA camera-stage VJP
#
# Reference being beaten: the reference's recursive per-sample loop
# (src/oo/Renderer.cpp:60-141); VERDICT r4 next-round item #1.
# ---------------------------------------------------------------------------


def _regen_replay_bwd_kernel(
    th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref,
    misc_ref,   # [1, 8] f32: env r, g, b
    imisc_ref,  # [1, 8] i32: sample0, seed0..2 (uint32 bits)
    lane_ref,   # [1, RTB] i32 canonical lane ids
    resid_ref,  # [RRES*NIT, RTB] f32 forward residual slots
    nit_ref,    # [1, RTB] i32 realized iterations (per-tile scalar)
    abar_ref,   # [3, RTB] f32 cotangent of the total acc output
    d0_ref,     # [9*SP, RTB] f32 out: d(state0) org/dir/beta, row r of
    #             sample s at r*SP + s (the forward's segment layout)
    dtri_ref,   # [TA, tcoef_pad] f32 out, accumulated across grid+loop
    dsph_ref,   # [SA, scoef_pad] f32 out
    denv_ref,   # [1, 8] f32 out
    cot_ref,    # scratch [13, RTB]: running output-state cotangent
    cin_ref,    # scratch [13, RTB]: the body's input-state cotangent
    prev_ref,   # scratch [1, RTB] i32: sample of the previous (higher-j) slot
    *, n_tri, n_sph, tcoef_pad, scoef_pad, eps, nb, s_count, sp_samples,
):
    from . import kernel_rng as kr

    u32 = jnp.uint32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dtri_ref[...] = jnp.zeros_like(dtri_ref)
        dsph_ref[...] = jnp.zeros_like(dsph_ref)
        denv_ref[...] = jnp.zeros_like(denv_ref)

    SP = sp_samples
    d0_ref[...] = jnp.zeros((9 * SP, RTB), jnp.float32)
    cot_ref[...] = jnp.zeros((13, RTB), jnp.float32)
    prev_ref[0, :] = jnp.full((RTB,), -1, jnp.int32)

    n_it = nit_ref[0, 0]
    sample0 = imisc_ref[0, 0]
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    seeds = jnp.where(
        rows3 == 0, imisc_ref[0, 1],
        jnp.where(rows3 == 1, imisc_ref[0, 2], imisc_ref[0, 3]),
    ).astype(u32)
    lane_row = jax.lax.bitcast_convert_type(lane_ref[...], u32)  # [1, RTB]

    def step(jj, _):
        j = n_it - 1 - jj
        blk = resid_ref[pl.ds(j * RRES, RRES), :]  # [RRES, RTB]
        s = blk[11, :].astype(jnp.int32)
        active = s < s_count
        # Sanitise INACTIVE lanes to the pad-lane shape the body already
        # guards (zero state, +inf t): their residual slots are garbage
        # (exhausted lanes keep tracing-era values; unwritten HBM rows are
        # uninitialised) and a NaN there would poison the one-hot gather
        # transposes (0 * NaN) even though the lane is masked out.
        af = active.astype(jnp.float32)
        d = jnp.where(active, blk[12, :].astype(jnp.int32), 1)
        t_saved = jnp.where(active, blk[9, :], _INF)
        idx = jnp.where(active, blk[10, :].astype(jnp.int32), 0)

        # segment boundary (reverse): this slot's sample differs from the
        # one processed just after it in forward order
        newseg = active & (s != prev_ref[0, :])
        nsf = newseg.astype(jnp.float32)
        for r in range(10):
            cot_ref[r, :] = cot_ref[r, :] * (1.0 - nsf)
        for r in range(3):
            cot_ref[10 + r, :] = jnp.where(
                active, abar_ref[r, :], cot_ref[10 + r, :]
            )

        # counter-RNG draws, bit-identical to the forward's premixed form
        sd_row = ((sample0 + s) * 256 + d).astype(u32).reshape(1, RTB)
        u, v, p_ev = kr.event_uniforms_rows(lane_row, sd_row, seeds)
        acos_u = kr.acos01(u)

        # WHERE, not `* af`: slots j < n_it are always written (exhausted
        # lanes carry their last real state, finite), but keep the
        # sanitiser NaN-robust anyway — NaN * 0 == NaN would leak through
        # the gather transposes.
        st = jnp.concatenate(
            [jnp.where(active[None, :], blk[0:9, :], 0.0),
             af.reshape(1, RTB),
             jnp.zeros((3, RTB), jnp.float32)], axis=0,
        )
        _bounce_bwd_body(
            th_ref, tm_ref, tl_ref, sh_ref, sm_ref, sl_ref, misc_ref,
            st, t_saved, idx, u, acos_u, v, p_ev, active,
            cot_ref, cin_ref, dtri_ref, dsph_ref, denv_ref,
            n_tri=n_tri, n_sph=n_sph, tcoef_pad=tcoef_pad,
            scoef_pad=scoef_pad, eps=eps,
        )

        # segment START (d == 1): the input-state cotangent IS d(state0)
        # of sample s — scatter rows 0..8 into the per-sample table
        segstart = active & (d == 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, (SP, RTB), 0)
        m = (srow == s[None, :]) & segstart[None, :]
        for r in range(9):
            seg = d0_ref[r * SP : (r + 1) * SP, :]
            d0_ref[r * SP : (r + 1) * SP, :] = jnp.where(
                m, cin_ref[r : r + 1, :], seg
            )
        # carry the chained cotangent for the next (lower-j) slot
        for r in range(13):
            cot_ref[r, :] = jnp.where(active, cin_ref[r, :], cot_ref[r, :])
        prev_ref[0, :] = jnp.where(active, s, prev_ref[0, :])
        return 0

    jax.lax.fori_loop(0, n_it, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_tri", "n_sph", "tcoef_pad", "scoef_pad", "eps",
                     "nb", "s_count", "sp_samples", "interpret"),
)
def _run_regen_replay_bwd(
    th, tm, tl, sh, sm, sl, misc, imisc, lane_ids, resid, nit, acc_bar,
    n_tri, n_sph, tcoef_pad, scoef_pad, eps, nb, s_count, sp_samples,
    interpret=False,
):
    r = resid.shape[1]
    kernel = functools.partial(
        _regen_replay_bwd_kernel,
        n_tri=n_tri, n_sph=n_sph,
        tcoef_pad=tcoef_pad, scoef_pad=scoef_pad, eps=eps,
        nb=nb, s_count=s_count, sp_samples=sp_samples,
    )
    tab = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    lane = lambda rows: pl.BlockSpec((rows, RTB), lambda i: (0, i), memory_space=pltpu.VMEM)
    nit_slots = s_count * nb
    return pl.pallas_call(
        kernel,
        grid=(r // RTB,),
        in_specs=[
            tab((TA, tcoef_pad)), tab((TA, tcoef_pad)), tab((TA, tcoef_pad)),
            tab((SA, scoef_pad)), tab((SA, scoef_pad)), tab((SA, scoef_pad)),
            tab((1, 8)), tab((1, 8)),
            lane(1), lane(RRES * nit_slots), lane(1), lane(3),
        ],
        out_specs=[
            lane(9 * sp_samples),
            tab((TA, tcoef_pad)),
            tab((SA, scoef_pad)),
            tab((1, 8)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9 * sp_samples, r), jnp.float32),
            jax.ShapeDtypeStruct((TA, tcoef_pad), jnp.float32),
            jax.ShapeDtypeStruct((SA, scoef_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((13, RTB), jnp.float32),
            pltpu.VMEM((13, RTB), jnp.float32),
            pltpu.VMEM((1, RTB), jnp.int32),
        ],
        interpret=interpret,
    )(th, tm, tl, sh, sm, sl, misc, imisc, lane_ids, resid, nit, acc_bar)


def regen_replay_bwd(
    packed: PackedSceneFused,
    environment: jnp.ndarray,  # [3]
    lane_ids: jnp.ndarray,  # [N] int32 (UNPADDED length n)
    key_words: tuple,  # (k0, k1) uint32 scalars
    sample0,
    resid: jnp.ndarray,  # [RRES*NIT, Npad] forward residuals (PADDED)
    nit: jnp.ndarray,  # [1, Npad] i32
    acc_bar: jnp.ndarray,  # [3, N] cotangent of the chain's acc output
    eps: float,
    nb: int,
    s_count: int,
    interpret: bool = False,
):
    """Reverse walk over the regen replay residuals. Returns
    (d_state0 [s_count*10, N] in the chain's sample-major layout with zero
    alive rows, d_tri_table, d_sph_table, d_env [3])."""
    from . import kernel_rng

    # The backward reads one forward tile's realized iteration count per
    # RTB tile (nit_ref[0, 0]), so every backward tile must sit inside one
    # forward tile: the forward tile RT (env-overridable via PT3_RT) has
    # to be a multiple of RTB or lanes would be silently dropped/misread.
    if RT % RTB:
        raise ValueError(
            f"regen replay backward needs RT ({RT}, PT3_RT) to be a "
            f"multiple of its tile RTB ({RTB})"
        )

    n = acc_bar.shape[1]
    npad = resid.shape[1]
    pad = npad - n
    f32 = lambda x: x.astype(jnp.float32)
    if pad:
        acc_bar = jnp.concatenate(
            [f32(acc_bar), jnp.zeros((3, pad), jnp.float32)], axis=1
        )
        lane_ids = jnp.concatenate(
            [lane_ids.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
        )
    else:
        acc_bar = f32(acc_bar)
        lane_ids = lane_ids.astype(jnp.int32)
    misc = jnp.concatenate(
        [environment.astype(jnp.float32).reshape(3), jnp.zeros(5, jnp.float32)]
    ).reshape(1, 8)
    i32c = lambda x: jax.lax.bitcast_convert_type(
        jnp.asarray(x, jnp.uint32), jnp.int32
    )
    seeds = kernel_rng.channel_seeds(
        jnp.asarray(key_words[0], jnp.uint32),
        jnp.asarray(key_words[1], jnp.uint32),
    ).reshape(3)
    imisc = jnp.stack(
        [jnp.asarray(sample0, jnp.int32),
         i32c(seeds[0]), i32c(seeds[1]), i32c(seeds[2]),
         jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)]
    ).reshape(1, 8)
    sp_samples = -(-s_count // 8) * 8
    th, tm, tl = packed.tri_coef
    sh, sm, sl = packed.sph_coef
    d0_seg, d_tri, d_sph, d_env = _run_regen_replay_bwd(
        th, tm, tl, sh, sm, sl, misc, imisc,
        lane_ids.reshape(1, -1), resid, nit, acc_bar,
        packed.n_tri, packed.n_sph,
        packed.tri_coef_pad, packed.sph_coef_pad,
        float(eps), int(nb), int(s_count), int(sp_samples), interpret,
    )
    # segment layout -> the chain's [s_count*10, N] sample-major layout
    # (zero alive rows: liveness is detached by design)
    d0 = d0_seg[:, :n].reshape(9, sp_samples, n)[:, :s_count, :]
    d0 = jnp.concatenate(
        [d0, jnp.zeros((1, s_count, n), jnp.float32)], axis=0
    )  # [10, S, N]
    d_state0 = d0.transpose(1, 0, 2).reshape(10 * s_count, n)
    return d_state0, d_tri, d_sph, d_env[0, :3]
