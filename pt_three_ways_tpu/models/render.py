"""Render orchestration: passes x tiles -> accumulation framebuffer.

The reference schedules work two ways — full-screen 1-spp passes merged as
futures complete (src/oo/Renderer.cpp:93-141) and a priority work queue of
16x16-px tiles (Renderer.cpp:143-183). On TPU the scheduler is the XLA
dispatch queue: we launch jitted (tile, pass) programs back to back; they
pipeline on device while the host accumulates finished passes, which is the
async future-merge loop with the mutexes deleted.

Tiling exists for memory, not load balancing: a tile is sized so the live
path state (W*H*K paths) fits comfortably in HBM; small frames are a single
tile. Pass results are merged into an (sum, count) ArrayOutput, preserving
the reference's associative accumulation contract.
"""

from __future__ import annotations

import math
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng
from ..utils.framebuffer import ArrayOutput
from ..utils.progress import Progressifier
from ..utils.render_params import RenderParams
from .ways import WAYS

# Cap on live paths (pixels * K substrata) per device dispatch; keeps the
# wavefront state + intersection intermediates well under HBM. The fused
# Pallas path holds only the path state (52 B/path), so TPU dispatches can
# be larger.
MAX_PATHS_PER_DISPATCH = 1 << 21
MAX_PATHS_PER_DISPATCH_TPU = 1 << 22


# HBM budget for the regen dispatch's precomputed per-sample state +
# uniform tables ((11 + 4*nb) * ppd f32 rows per path); v5e has 16 GB.
STATE_TABLE_BUDGET_BYTES = 4 << 30


def uses_regen(params: RenderParams, way: str, scene=None) -> bool:
    """True when render() dispatches the REGENERATING megakernel (which
    precomputes per-sample state tables sized by passes_per_dispatch).
    With ``scene``, additionally requires the megakernel's broadcast scene
    tables (~240 B/tri with the bf16x3 attributes) to fit the VMEM budget;
    bigger scenes run the scan wavefront (Pallas intersect while the 48
    B/tri tables fit, XLA chunked scan beyond — see resolve_intersector)."""
    from .integrator import resolve_intersector

    backend = resolve_intersector(params, scene)
    ok = (
        way in ("dod", "wavefront")
        and not params.preview
        and backend.startswith("pallas")
        and params.fused != "off"
        and params.kill_dead_paths
    )
    if ok and scene is not None and not backend.endswith("interpret"):
        from ..ops.pallas_megakernel import scene_fits_pallas

        ok = scene_fits_pallas(scene, fused=True)
    if not ok and way in ("dod", "wavefront"):
        # STREAMING tier: over-budget scenes keep the regen megakernel
        # with HBM-windowed triangles (integrator.uses_stream)
        from .integrator import uses_stream

        ok = uses_stream(params, scene)
    return ok


def _tile_rows(params: RenderParams, ppd: int = 1, regen: bool = True,
               scene=None) -> int:
    k = max(params.first_bounce_samples, 1)
    cap = (
        MAX_PATHS_PER_DISPATCH_TPU
        if jax.default_backend() == "tpu"
        else MAX_PATHS_PER_DISPATCH
    )
    if scene is not None:
        from .integrator import uses_stream

        if uses_stream(params, scene):
            # STREAM-tier wall-clock cap: one megakernel dispatch runs
            # ~lanes * ppd * mean_bounces * (T/64 chunks) * 1.4us/RT of
            # triangle math; past tens of seconds the TPU runtime faults
            # the kernel (measured: sub3 S=32 at 1M lanes dies, S=8 at
            # 13 s/dispatch survives). Budget ~8 s per dispatch.
            t = max(int(scene.num_triangles), 1)
            from ..ops.pallas_intersect import RT as _RT

            cap = min(cap, max(int(4.0e9 / (max(ppd, 1) * t)), _RT))
    if regen and ppd > 1:
        # larger pass fusion multiplies the regen path's per-path state
        # tables; shrink the tile so open scenes can run their measured
        # ppd=32 optimum at any resolution without exhausting HBM. The
        # non-regen paths precompute no tables and keep the full tile.
        from .integrator import resolve_rng_mode

        nb = max(params.max_depth - 1, 0)
        if resolve_rng_mode(params) == "kernel":
            # in-kernel RNG: the [10*SP, N] sample-major state table, where
            # SP is the sample count padded to the 8-sublane tile; no
            # uniform tables (see fused_passes_krng layout)
            sp_pad = -(-ppd // 8) * 8
            bytes_per_path = 10 * 4 * sp_pad
        else:
            bytes_per_path = (11 + 4 * nb) * 4 * ppd
        cap = min(
            cap, max(STATE_TABLE_BUDGET_BYTES // bytes_per_path, 1 << 16)
        )
    max_pixels = max(cap // k, params.width)
    rows = max(1, min(params.height, max_pixels // params.width))
    return rows


def autotune_decisions(counts: np.ndarray, s0: int, nb: int,
                       n_tri: int, n_sph: int) -> dict:
    """Regen tuning from the FIRST dispatch's per-lane live-bounce counts
    (the kernel's free ``cnt`` output) — replaces name-keyed hint lookups
    for unknown scenes (VERDICT r3 weak #5). Derived thresholds reproduce
    the measured catalog rows (tests/test_autotune.py):

      * mean realized depth / max depth  ->  "closed" (cornell-like: paths
        never escape, m ~ 1.0) vs open/emissive (suzanne 0.3, ce 0.25);
      * regen waste estimate (1 - sum/ (n_RT_tiles * tilemax)) -> whether
        the feedback work-sort + tail compaction pay (suzanne 57% at S=8
        unsorted; cornell 14.5%; ce near-uniform counts -> small).

    Returns dict(rng_mode, passes_per_dispatch, feedback_sort, tail_frac).
    """
    from ..ops.pallas_intersect import RT as _RT

    counts = np.asarray(counts, np.int64)
    n = counts.size
    total = int(counts.sum())
    m = total / max(n * s0 * max(nb, 1), 1)
    pad = (-n) % _RT
    tiles = np.pad(counts, (0, pad)).reshape(-1, _RT)
    disp = int((tiles.max(axis=1) * _RT).sum())
    waste = 1.0 - total / max(disp, 1)
    live_frac = float((counts > 0).mean())
    # measured separation (32x32 S=8 interpret, tests/test_autotune.py):
    # cornell m=0.85, suzanne 0.31, owl 0.23, ce 0.0
    closed = m > 0.7
    # table RNG + small pass groups won only on closed single-chunk scenes
    # (cornell: the in-kernel hash tax beats the one-block table select)
    small = n_tri <= 64 and n_sph <= 64
    if closed and small:
        return dict(rng_mode="table", passes_per_dispatch=8,
                    feedback_sort=False, tail_frac=0.0)
    # sort/tail pay only when the kernel is both DIVERGENT and POPULATED:
    # ce-class emissive kills empty the kernel (live_frac ~ 0) — its waste
    # reads high but there is nothing to reorder, and both knobs measured
    # as losses there (catalog hint comments)
    divergent = waste > 0.25 and live_frac > 0.05
    return dict(
        rng_mode="kernel",
        passes_per_dispatch=64,
        feedback_sort=divergent,
        tail_frac=0.125 if divergent else 0.0,
    )



def _stream_ppd_cap(params: RenderParams, scene, ppd: int) -> int:
    """Stream-tier kernel wall-clock budget (see _tile_rows): the smallest
    dispatch is one pixel row (width * K lanes), so cap the pass-group size
    so lanes * ppd * T stays inside the TPU kernel fault window even at
    rows=1. Shared by render(), its autotune retune, and the sharded
    renderer so the flavours cannot drift."""
    min_lanes = params.width * max(params.first_bounce_samples, 1)
    t = max(int(scene.num_triangles), 1)
    return max(min(ppd, int(4.0e9 / (min_lanes * t))), 1)


def make_pass_fn(scene, camera, params: RenderParams, way: str = "dod",
                 tri_chunk: int = 1024, n_passes: int = 1) -> Callable:
    """Returns jitted fn(base_key, sample0, px, py) -> radiance SUM [R, 3]
    over ``n_passes`` consecutive sample passes (keys fold exactly like the
    unfused path: fold_in(fold_in(base, sample), tile) happens inside, so
    fused and unfused dispatch produce matching accumulations).

    On the Pallas path the dod way uses the REGENERATING megakernel
    (ops/pallas_megakernel._megakernel_regen): one dispatch traces all
    ``n_passes`` samples per lane, refilling dead lanes with the next
    sample's first bounce, which removes the dead-lane waste of per-pass
    dispatching."""
    from .integrator import trace_passes_fused

    use_regen = uses_regen(params, way, scene)
    if use_regen:
        if params.regen_feedback_sort:
            @jax.jit
            def pass_fn(base_key, sample0, tile_idx, px, py, sort_key):
                rad, cnts = trace_passes_fused(
                    scene, camera, params, base_key, sample0, tile_idx,
                    px, py, n_passes, tri_chunk,
                    sort_key=sort_key, with_lane_counts=True,
                )
                # running-sum key (inside the jit: a host-side add would
                # cost an extra dispatch per call): each lane's expected
                # depth is a stationary property of its pixel geometry, so
                # accumulated counts sort better than the last dispatch
                # alone (suzanne 38.5 -> 36.1 ms/pass)
                return rad, sort_key + cnts

            return pass_fn

        @jax.jit
        def pass_fn(base_key, sample0, tile_idx, px, py):
            return trace_passes_fused(
                scene, camera, params, base_key, sample0, tile_idx,
                px, py, n_passes, tri_chunk,
            )

        return pass_fn

    trace = WAYS[way]

    @jax.jit
    def pass_fn(base_key, sample0, tile_idx, px, py):
        def body(i, acc):
            key = jax.random.fold_in(
                jax.random.fold_in(base_key, sample0 + i), tile_idx
            )
            return acc + trace(scene, camera, params, key, px, py, tri_chunk)

        init = jnp.zeros((px.shape[0], 3), jnp.float32)
        if n_passes == 1:
            return body(0, init)
        return jax.lax.fori_loop(0, n_passes, body, init)

    return pass_fn


def render(
    scene,
    camera,
    params: RenderParams,
    way: str = "dod",
    update_fn: Optional[Callable[[ArrayOutput], None]] = None,
    save_every_seconds: float = 0.0,
    progress: bool = False,
    tri_chunk: int = 1024,
    resume_from: Optional[str] = None,
) -> ArrayOutput:
    """Full render: samples_per_pixel 1-spp passes over all pixels.

    ``update_fn`` receives the partially-accumulated ArrayOutput, throttled
    to at most once per ``save_every_seconds`` (main.cpp:331-343) — used for
    the periodic checkpoint save.

    ``resume_from``: path of a ``.raw`` checkpoint written by a previous run
    of the SAME configuration; rendering continues at the next sample pass
    (counter-based RNG makes the result bit-identical to an uninterrupted
    run — the elastic-recovery contract of SURVEY.md section 5).

    Bit-identity granularity: per-sample radiance values are ALWAYS
    identical; the f32 on-device pre-summation order additionally matches
    the uninterrupted run when the checkpoint's sample count falls on one
    of that run's pass-group boundaries — which is where ``--save-every``
    writes, so same-schedule crash/resume is bit-identical end to end
    (verified on hardware, VALIDATION.md round 4). A checkpoint imported
    from a DIFFERENT spp schedule (e.g. a standalone 16-spp render resumed
    toward 24 spp under an autotuned 64-pass group) may split a group the
    uninterrupted run fused, changing only the f32 summation grouping —
    estimator-identical, not byte-identical.
    """
    width, height = params.width, params.height
    start_sample = 0
    if resume_from is not None:
        prev = ArrayOutput.load(resume_from)
        if (prev.width, prev.height) != (width, height):
            raise ValueError(
                "resume checkpoint size mismatch: "
                f"{prev.width}x{prev.height} vs {width}x{height}"
            )
        if prev.count.max() != prev.count.min():
            raise ValueError(
                "resume checkpoint has non-uniform sample counts "
                f"({prev.count.min()}..{prev.count.max()}); checkpoints are "
                "written at pass boundaries so this is not a pt3 checkpoint"
            )
        start_sample = int(prev.count.min())
    out = ArrayOutput(width, height)
    if resume_from is not None:
        out += prev

    # Fuse several sample passes into one device dispatch: dispatch latency
    # on a tunneled TPU is tens of ms, so singles would dominate long
    # renders. The fused accumulation uses the identical per-(sample, tile)
    # key chain — per-sample radiances are identical; only the f32 on-device
    # pre-summation order differs from single-pass dispatching. A fixed
    # configuration remains bit-deterministic run to run.
    # 8 is the conservative default (cornell optimum; also the autotune
    # probe's group size); the RUNTIME AUTOTUNE below grows it to the
    # per-scene optimum (open scenes prefer 64) and _tile_rows shrinks
    # the tile to keep the large-group state tables inside the HBM budget.
    # An explicit params.passes_per_dispatch pins the group size while
    # rng/sort/tail stay autotuned.
    ppd = params.passes_per_dispatch or (
        8 if jax.default_backend() == "tpu" else 1
    )
    if uses_regen(params, way, scene):
        from .integrator import resolve_rng_mode

        if resolve_rng_mode(params) == "kernel":
            # in-kernel RNG regen tracks sample liveness in a two-word
            # per-lane bitmask — cap at the kernel's actual capacity
            from ..ops.pallas_megakernel import S_COUNT_MAX

            ppd = min(ppd, S_COUNT_MAX)
        from .integrator import uses_stream

        if uses_stream(params, scene):
            ppd = _stream_ppd_cap(params, scene, ppd)
    # RUNTIME AUTO-TUNE: when every regen knob is at its default (an
    # unknown scene on TPU — catalog scenes arrive with measured hints
    # from the CLI), the FIRST pass group doubles as a probe: its per-lane
    # bounce counts (free kernel output) drive autotune_decisions, and the
    # remaining groups run the derived (rng_mode, ppd, sort, tail). The
    # probe group's samples are identical either way (zero sort key =
    # identity permutation), so the estimator is untouched; on --resume
    # the probe is RE-TRACED (radiance discarded) so a resumed run reaches
    # the same decisions and stays bit-identical to an uninterrupted one.
    # An EXPLICIT passes_per_dispatch pins the group size but does not
    # disable tuning: rng mode / feedback sort / tail are still derived
    # from the probe (the deleted hint-table era applied the sort
    # independently of an explicit group size — autotune keeps that).
    autotune = (
        params.autotune
        and jax.default_backend() == "tpu"
        and uses_regen(params, way, scene)
        and params.rng_mode == "auto"
        and not params.regen_feedback_sort
        and params.regen_tail_frac == 0.0
        and params.samples_per_pixel > max(8, params.passes_per_dispatch)
    )
    # The autotune probe group is the FIRST group the uninterrupted run
    # dispatches: min(ppd, spp) AFTER the S_COUNT_MAX / stream-tier caps
    # above. Resume re-traces with this exact size (and autotune_decisions
    # scales its mean-depth estimate by it) so a resumed run reaches the
    # same tuning decisions as an uninterrupted one.
    probe_n = min(ppd, params.samples_per_pixel)
    pass_fns = {}
    cur_params = params

    def get_fn(n):
        if n not in pass_fns:
            pass_fns[n] = make_pass_fn(
                scene, camera, cur_params, way, tri_chunk, n
            )
        return pass_fns[n]

    # with autotune the final group size may grow to 64 — size the tile
    # rows for the worst case so tiling never changes mid-render
    rows_per_tile = _tile_rows(
        params, 64 if autotune else ppd,
        regen=uses_regen(params, way, scene), scene=scene,
    )
    n_tiles = math.ceil(height / rows_per_tile)
    # Static tile shapes: pad the last tile's rows.
    xs = np.tile(np.arange(width, dtype=np.int32), rows_per_tile)
    base_ys = np.repeat(np.arange(rows_per_tile, dtype=np.int32), width)

    base_key = rng.base_key(params.seed)
    total = params.samples_per_pixel * n_tiles
    prog = Progressifier(total) if progress else None
    next_save = time.monotonic() + save_every_seconds

    spp = params.samples_per_pixel
    done = start_sample * n_tiles
    sample = start_sample
    # feedback work-sort: per-tile lane-count chain (zeros on the first
    # dispatch -> stable argsort -> identity order; counts are chained in
    # unsorted lane order so resume/restart only resets the heuristic,
    # never the estimator — the permutation is bit-exact)
    feedback = uses_regen(params, way, scene) and (
        params.regen_feedback_sort or autotune
    )
    if autotune:
        # the probe group must return lane counts: run it through the
        # feedback-fn shape with a zero (identity) sort key
        cur_params = params.replace(regen_feedback_sort=True)
    k_sub = max(params.first_bounce_samples, 1)
    tile_counts = {}

    def apply_tuning():
        """Decide from the drained probe counts; rebuild the pass fns."""
        nonlocal cur_params, ppd, feedback
        from .integrator import resolve_rng_mode, uses_stream

        counts = np.concatenate(
            [tile_counts[t] for t in sorted(tile_counts)]
        )
        dec = autotune_decisions(
            counts, probe_n, max(params.max_depth - 1, 0),
            scene.num_triangles, scene.num_spheres,
        )
        cur_params = params.replace(
            rng_mode=dec["rng_mode"],
            regen_feedback_sort=dec["feedback_sort"],
            regen_tail_frac=dec["tail_frac"],
        )
        if not params.passes_per_dispatch:
            ppd = dec["passes_per_dispatch"]
            if resolve_rng_mode(cur_params) == "kernel":
                from ..ops.pallas_megakernel import S_COUNT_MAX

                ppd = min(ppd, S_COUNT_MAX)
            if uses_stream(cur_params, scene):
                ppd = _stream_ppd_cap(params, scene, ppd)
        pass_fns.clear()
        feedback = uses_regen(cur_params, way, scene) and dec["feedback_sort"]
        if not feedback:
            tile_counts.clear()

    # One-dispatch-deep pipeline: jax dispatch is async, so enqueueing tile
    # t+1 BEFORE converting tile t's result lets the device compute while
    # the host blocks on the previous transfer + accumulates — the
    # reference's future-merge overlap (src/oo/Renderer.cpp:93-141) without
    # threads. Short tunneled renders previously paid the full relay
    # latency per dispatch. PT3_NO_PIPELINE=1 drains eagerly (A/B knob).
    pending = None
    import os as _os

    eager = _os.environ.get("PT3_NO_PIPELINE", "") == "1"

    if autotune and start_sample > 0:
        # resumed run: RE-TRACE the original first group's counts (radiance
        # discarded) so the tuning decisions — and therefore every
        # remaining sample's schedule and RNG mode — match the
        # uninterrupted run bit for bit
        probe_fn = get_fn(probe_n)
        for tile in range(n_tiles):
            ppx = jnp.asarray(xs)
            ppy = jnp.asarray(base_ys + tile * rows_per_tile)
            zk = jnp.zeros((ppx.shape[0] * k_sub,), jnp.int32)
            _, cnts = probe_fn(base_key, 0, tile, ppx, ppy, zk)
            tile_counts[tile] = np.asarray(cnts)
        apply_tuning()
        autotune = False

    def drain():
        nonlocal pending, done
        if pending is None:
            return
        tile, n, radiance, counts = pending
        pending = None
        if counts is not None:
            # chain the feedback key on the host (see tile_counts note)
            tile_counts[tile] = np.asarray(counts)
        y0 = tile * rows_per_tile
        rows = min(rows_per_tile, height - y0)
        rad = np.asarray(radiance, np.float64)
        out.sum[y0 : y0 + rows] += rad.reshape(rows_per_tile, width, 3)[:rows]
        out.count[y0 : y0 + rows] += n
        done += n
        if prog:
            prog.update(done)

    while sample < spp:
        n = min(ppd, spp - sample)
        fn = get_fn(n)
        for tile in range(n_tiles):
            y0 = tile * rows_per_tile
            px = jnp.asarray(xs)
            py = jnp.asarray(base_ys + y0)
            if feedback:
                key_in = tile_counts.get(tile)
                if key_in is None:
                    key_in = np.zeros((px.shape[0] * k_sub,), np.int32)
                # the same tile's PREVIOUS dispatch must be drained first —
                # its counts feed this dispatch's sort key (single-tile
                # frames hit this every iteration)
                if pending is not None and pending[0] == tile:
                    drain()
                radiance, new_counts = fn(
                    base_key, sample, tile, px, py, jnp.asarray(key_in)
                )
                drain()
                # keep inactive tiles' keys on the HOST: device-resident
                # copies would pin W*H*K*4 bytes of HBM for the whole
                # render on top of the active tile's state tables
                pending = (tile, n, radiance, new_counts)
            else:
                radiance = fn(base_key, sample, tile, px, py)
                drain()
                pending = (tile, n, radiance, None)
            if eager:
                drain()
        sample += n
        if autotune:
            # the probe group is complete: drain its counts and switch the
            # remaining groups to the derived configuration
            drain()
            apply_tuning()
            autotune = False
        # Checkpoint only at pass-group boundaries: every tile is now at the
        # same sample count, so a later --resume continues bit-identically
        # (a mid-pass save would leave tiles at unequal counts and resuming
        # from min(count) would double-accumulate the tiles already past it).
        if update_fn and save_every_seconds > 0:
            now = time.monotonic()
            if now > next_save:
                drain()
                update_fn(out)
                next_save = now + save_every_seconds
    drain()
    return out
