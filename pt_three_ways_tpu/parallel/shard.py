"""Sharded rendering: shard_map over the (dp, sp) mesh.

One fused device program renders up to ``dp`` independent sample passes of
the SAME pixels (replicated over dp, sharded spatially over sp), and psums
the framebuffer over ``dp`` — the whole of the reference's
thread/future/mutex scheduling collapses into a single SPMD step with one
XLA collective.

RNG: the key for sample ``s`` on spatial shard ``q`` of memory tile ``m`` is
``fold(fold(base, s), m*sp + q)`` — a pure function of the GLOBAL sample
index (and the same chain whether the sample is rendered by a single-pass
dispatch or inside a regen megakernel block), so:

  * a fixed seed gives a bit-identical image for a fixed mesh/tiling shape;
  * changing ``dp`` AT FIXED sp only changes which replica computes a
    sample, not its value — the image is unchanged up to f32 psum order
    when every sample renders through the same dispatch kind (regen block
    vs single pass; spp aligned to dp*S guarantees it — otherwise samples
    that straddle the block/remainder split agree to estimator tolerance
    only). sp changes the spatial shard blocks, so images across different
    sp are equal only statistically;
  * ``--resume`` continues at the exact next sample, like the single-device
    path (models/render.py).

Feature parity with the single-device ``render()``: memory tiling (a tile is
sized so live path state fits in HBM), throttled ``update_fn`` checkpoints
at pass-group boundaries, progress lines, exact spp (a final partial round
masks the inactive dp replicas instead of rounding spp up).
"""

from __future__ import annotations

import math
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import rng
from ..models.render import _tile_rows
from ..models.ways import WAYS
from ..utils.framebuffer import ArrayOutput
from ..utils.progress import Progressifier
from ..utils.render_params import RenderParams


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def make_sharded_pass_fn(
    scene, camera, params: RenderParams, mesh: Mesh, way: str = "dod",
    tri_chunk: int = 1024, n_passes: int = 1, regen: bool = False,
    feedback_sort: bool = False,
):
    """Returns fn(base_key, sample0, tile_idx, px, py[, sort_key]) ->
    radiance [R, 3] summed over the ACTIVE dp replicas (plus the updated
    sort key when ``feedback_sort``).

    px/py are the per-tile ray coordinates, replicated over dp and sharded
    over sp (R divisible by sp). The key for sample ``s`` on spatial shard
    ``q`` of tile ``m`` is fold(fold(base, s), m*sp + q) in EVERY mode —
    a pure function of the global sample index, so changing dp at fixed
    sp cannot change any sample's value.

    ``n_passes == 1``: dp replica d renders global sample ``sample0 + d``
    and is masked out when that reaches spp, so the sum covers
    ``min(dp, spp - sample0)`` passes.

    ``n_passes > 1``: replica d renders the BLOCK of global samples
    ``sample0 + d*n_passes ..+ n_passes - 1`` — via ONE regenerating
    megakernel dispatch when ``regen`` (per-chip flagship speed on the
    sharded path too), otherwise a fori_loop of per-sample traces (the
    dispatch-latency fusion the single-device path has always had). The
    caller guarantees full blocks (dp * n_passes <= spp - sample0); the
    trailing remainder uses an ``n_passes == 1`` fn.

    ``feedback_sort`` (regen only): threads the per-lane bounce-count
    running sum (psum'd over dp so every replica sorts by the same
    global key) — see models/integrator.trace_passes_fused.
    """
    trace = WAYS[way]
    sp = mesh.shape["sp"]
    spp = params.samples_per_pixel

    def shard_fn(base_key, sample0, tile_idx, px, py, sort_key=None):
        # px/py arrive as the per-sp-shard slice [R / sp], REPLICATED over
        # dp: every dp replica traces the SAME pixels for its own sample
        # index, so the psum below merges independent sample passes of
        # identical pixels (round 1 sharded px over dp too, which summed
        # unrelated pixels).
        dp_idx = jax.lax.axis_index("dp")
        sp_idx = jax.lax.axis_index("sp")
        combined = tile_idx * sp + sp_idx
        if n_passes > 1 and regen:
            from ..models.integrator import trace_passes_fused

            sample_base = sample0 + dp_idx * n_passes
            if feedback_sort:
                radiance, cnts = trace_passes_fused(
                    scene, camera, params, base_key, sample_base, combined,
                    px, py, n_passes, tri_chunk,
                    sort_key=sort_key, with_lane_counts=True,
                )
                return (
                    jax.lax.psum(radiance, "dp"),
                    sort_key + jax.lax.psum(cnts, "dp"),
                )
            radiance = trace_passes_fused(
                scene, camera, params, base_key, sample_base, combined,
                px, py, n_passes, tri_chunk,
            )
            return jax.lax.psum(radiance, "dp")
        if n_passes > 1:
            def body(i, acc):
                s = sample0 + dp_idx * n_passes + i
                k = rng.tile_key(rng.pass_key(base_key, s), combined)
                return acc + trace(scene, camera, params, k, px, py,
                                   tri_chunk)

            radiance = jax.lax.fori_loop(
                0, n_passes, body,
                jnp.zeros((px.shape[0], 3), jnp.float32),
            )
            return jax.lax.psum(radiance, "dp")
        sample = sample0 + dp_idx
        k = rng.tile_key(rng.pass_key(base_key, sample), combined)
        radiance = trace(scene, camera, params, k, px, py, tri_chunk)
        active = (sample < spp).astype(radiance.dtype)
        # merge sample passes over dp (the reference's operator+= merge,
        # src/util/ArrayOutput.cpp:48-57, as one ICI collective)
        return jax.lax.psum(radiance * active, "dp")

    with_key = n_passes > 1 and regen and feedback_sort
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("sp"), P("sp"))
        + ((P("sp"),) if with_key else ()),
        out_specs=(P("sp"), P("sp")) if with_key else P("sp"),
        check_vma=False,
    )
    return jax.jit(sharded)


def render_sharded(
    scene,
    camera,
    params: RenderParams,
    mesh: Mesh,
    way: str = "dod",
    tri_chunk: int = 1024,
    update_fn: Optional[Callable[[ArrayOutput], None]] = None,
    save_every_seconds: float = 0.0,
    progress: bool = False,
    resume_from: Optional[str] = None,
) -> ArrayOutput:
    """Full sharded render with single-device feature parity (see module
    docstring). spp is consumed dp samples at a time; the last round masks
    inactive replicas so the output holds EXACTLY spp samples per pixel."""
    width, height = params.width, params.height
    dp = mesh.shape["dp"]
    spp = params.samples_per_pixel

    start_sample = 0
    prev = None
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
    if prev is not None:
        out += prev

    # Block rounds: each dp replica consumes a BLOCK of S samples per
    # dispatch — via the regen megakernel when the flagship path is active
    # (per-chip speed matches the single-device megakernel), else a
    # fori_loop of passes (same dispatch-latency fusion as render()); the
    # remainder falls back to masked single-pass dispatches for exact spp.
    from ..models.render import autotune_decisions, uses_regen

    regen = uses_regen(params, way, scene)
    feedback = regen and params.regen_feedback_sort

    def _cap_S(p, S):
        S = min(S, max(spp // dp, 1))
        if regen:
            from ..models.integrator import resolve_rng_mode, uses_stream

            if resolve_rng_mode(p) == "kernel":
                # in-kernel RNG regen tracks sample liveness in a two-word
                # per-lane bitmask — cap at the kernel's actual capacity
                from ..ops.pallas_megakernel import S_COUNT_MAX

                S = min(S, S_COUNT_MAX)
            if uses_stream(p, scene):
                from ..models.render import _stream_ppd_cap

                S = _stream_ppd_cap(p, scene, S)
        return S

    S = params.passes_per_dispatch or (
        8 if jax.default_backend() == "tpu" else 1
    )
    # blocks are capped by the samples available per replica; size the
    # tile (and compile) for what rounds will actually use
    S = _cap_S(params, S)
    # RUNTIME AUTO-TUNE, sharded flavour (mirrors models/render.render):
    # when every regen knob is at its default, the FIRST block round
    # doubles as a probe — its per-lane bounce counts (psum'd over dp, so
    # every replica would sort by the same global key) drive
    # autotune_decisions and the remaining rounds run the derived
    # (rng_mode, S, sort, tail). The probe's samples are identical either
    # way (zero sort key = identity permutation).
    autotune = (
        params.autotune
        and regen
        and (
            jax.default_backend() == "tpu"
            or params.intersector == "pallas-interpret"
        )
        and params.rng_mode == "auto"
        and not params.regen_feedback_sort
        and params.regen_tail_frac == 0.0
        and spp > max(8, params.passes_per_dispatch)
        and spp // dp > 1
    )
    pass_fns = {}
    cur_params = params
    if autotune:
        if not params.passes_per_dispatch:
            # the probe round needs a multi-pass block for its lane counts
            # (interpret-mode flavour would otherwise default to S=1); an
            # explicit passes_per_dispatch pins the group size (probe
            # included) while rng/sort/tail stay autotuned
            S = _cap_S(params, max(S, 8))
        cur_params = params.replace(regen_feedback_sort=True)
        feedback = True
    probe_n = min(S, max(spp // dp, 1))

    def get_fn(n):
        if n not in pass_fns:
            pass_fns[n] = make_sharded_pass_fn(
                scene, camera, cur_params, mesh, way, tri_chunk, n,
                regen=regen, feedback_sort=feedback and n > 1,
            )
        return pass_fns[n]

    sp = mesh.shape["sp"]

    # Memory tiling as in the single-device path: rows per dispatch so the
    # per-device live path state stays bounded; ray count padded to sp.
    # The regen state-table budget is computed as if unsharded — each
    # device holds 1/sp of it, so this is conservative.
    # with autotune the post-probe block size may grow to 64 — size the
    # tile rows for the worst case so tiling never changes mid-render
    rows_per_tile = _tile_rows(
        params, 64 if autotune else S, regen=regen, scene=scene
    )
    n_tiles = math.ceil(height / rows_per_tile)
    tile_rays = _pad_to(rows_per_tile * width, sp)
    flat = np.arange(tile_rays, dtype=np.int32)
    xs = flat % width
    base_ys = np.minimum(flat // width, rows_per_tile - 1)

    base = rng.base_key(params.seed)
    total = spp * n_tiles
    prog = Progressifier(total) if progress else None
    next_save = time.monotonic() + save_every_seconds

    done = start_sample * n_tiles
    sample = start_sample
    k_sub = max(params.first_bounce_samples, 1)
    tile_keys = {}  # feedback sort: host-resident per-tile count chain

    def apply_tuning():
        """Decide from the drained probe counts; rebuild the pass fns."""
        nonlocal cur_params, S, feedback
        counts = np.concatenate([tile_keys[t] for t in sorted(tile_keys)])
        dec = autotune_decisions(
            counts, probe_n * dp, max(params.max_depth - 1, 0),
            scene.num_triangles, scene.num_spheres,
        )
        cur_params = params.replace(
            rng_mode=dec["rng_mode"],
            regen_feedback_sort=dec["feedback_sort"],
            regen_tail_frac=dec["tail_frac"],
        )
        if not params.passes_per_dispatch:
            S = _cap_S(cur_params, dec["passes_per_dispatch"])
        pass_fns.clear()
        feedback = regen and dec["feedback_sort"]
        if not feedback:
            tile_keys.clear()

    if autotune and start_sample > 0:
        # resumed run: RE-TRACE the original probe round's counts
        # (radiance discarded) so the tuning decisions match the
        # uninterrupted run bit for bit
        probe_fn = get_fn(probe_n)
        for tile in range(n_tiles):
            ppx = jnp.asarray(xs)
            ppy = jnp.asarray(
                np.minimum(base_ys + tile * rows_per_tile, height - 1)
            )
            zk = jnp.zeros((tile_rays * k_sub,), np.int32)
            _, nk = probe_fn(base, 0, tile, ppx, ppy, jnp.asarray(zk))
            tile_keys[tile] = np.asarray(nk)
        apply_tuning()
        autotune = False

    while sample < spp:
        remaining = spp - sample
        if remaining >= dp:
            # full blocks only: every replica renders exactly n samples
            n = min(S, remaining // dp)
            n_active = dp * n
        else:
            # trailing remainder: masked single-pass dispatch
            n = 1
            n_active = remaining
        pass_fn = get_fn(n)
        for tile in range(n_tiles):
            y0 = tile * rows_per_tile
            px = jnp.asarray(xs)
            py = jnp.asarray(np.minimum(base_ys + y0, height - 1))
            if feedback and n > 1:
                key_in = tile_keys.get(tile)
                if key_in is None:
                    key_in = np.zeros((tile_rays * k_sub,), np.int32)
                rad, new_key = pass_fn(
                    base, sample, tile, px, py, jnp.asarray(key_in)
                )
                tile_keys[tile] = np.asarray(new_key)
            else:
                rad = pass_fn(base, sample, tile, px, py)
            rad = np.asarray(rad, np.float64)[: rows_per_tile * width]
            rows = min(rows_per_tile, height - y0)
            out.sum[y0 : y0 + rows] += rad.reshape(rows_per_tile, width, 3)[
                :rows
            ]
            out.count[y0 : y0 + rows] += n_active
            done += n_active
            if prog:
                prog.update(done)
        sample += n_active
        if autotune:
            # the probe round is complete: decide and rebuild
            apply_tuning()
            autotune = False
        # pass-group boundary: uniform counts -> resumable checkpoint
        if update_fn and save_every_seconds > 0:
            now = time.monotonic()
            if now > next_save:
                update_fn(out)
                next_save = now + save_every_seconds
    return out
