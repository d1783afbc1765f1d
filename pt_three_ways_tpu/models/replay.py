"""Path-replay differentiable rendering over the FUSED Pallas bounce.

The training step was previously locked to the slow lax.scan wavefront
(``fused="off"``) because the fused kernels are forward-only. This module
gives the fused single-bounce kernel (ops/pallas_megakernel.bounce_step) a
path-replay VJP, so training runs the Pallas forward at full speed:

  * FORWARD: a chain of ``bounce_step`` kernel dispatches (fused
    intersect+shade in VMEM, all-dead ray tiles skip their body), each also
    emitting its winner record ``(t, packed idx)`` and saving the [13, N]
    path state at the bounce boundary.
  * BACKWARD: NO re-intersection anywhere. Per bounce (in reverse),
    ``jax.vjp`` of the pure-jnp bounce tail (models/integrator.
    bounce_from_hits — the exact function the scan wavefront uses) evaluated
    at the SAVED boundary state, with shading inputs rebuilt from the saved
    winner by ops/intersect.hits_from_winner (one one-hot matmul + VPU
    work). The winner distance's ray-derivative is the same implicit-
    function-theorem formula as the forward kernel's custom VJP
    (ops/pallas_intersect._kernel_tx_bwd):

        dt/d_org = -g / (g . d),   dt/d_dir = -t g / (g . d)

    with g the winner's (unnormalised) geometric normal.

Estimator notes:
  * The kernel forward and the scan wavefront agree to f32 rounding order,
    so the replayed linearisation points match the scan path's own backward
    to the same tolerance — gradients agree to ~1e-5 rel (tested).
  * The likelihood-ratio branch weight (integrator.branch_weight) is
    applied in the REPLAY (primal exactly 1.0, so the kernel forward needs
    no change); discrete decisions (event choice, winner index, liveness)
    are detached exactly as in the scan path.
  * Zero-throughput kill is ON (the kernel kills dead paths): parameters
    sitting EXACTLY at 0 albedo get no gradient through later bounces —
    the scan path with ``kill_dead_paths=False`` remains available for
    that corner (parallel/train.py ``fused="off"``).

Reference for the estimator being differentiated: src/dod/Scene.cpp:124-179
(the same radiance the forward megakernel reproduces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rng
from ..ops.camera import generate_rays
from ..ops.gather import onehot_gather
from ..ops.intersect import Hits, hits_from_winner, intersect_scene
from ..utils.render_params import RenderParams
from .integrator import (
    GatheredMat,
    PathState,
    bounce_from_hits,
    branch_weight,
    effective_reflectivity,
    gather_materials,
    resolve_intersector,
    sample_direction,
)

_INF = float("inf")


@jax.custom_vjp
def _winner_t(org, dirn, t_saved, g):
    """Identity on the saved winner distance, with the analytic IFT ray-
    derivative as its VJP (t_saved and g are detached residuals)."""
    return t_saved


def _winner_t_fwd(org, dirn, t_saved, g):
    return t_saved, (dirn, t_saved, g)


def _winner_t_bwd(res, t_bar):
    dirn, t, g = res
    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    tb = jnp.where(hit, t_bar, 0.0)
    gd = g[0] * dirn[0] + g[1] * dirn[1] + g[2] * dirn[2]
    inv = jnp.where(
        jnp.abs(gd) > 1e-20, 1.0 / jnp.where(gd == 0, 1.0, gd), 0.0
    )
    scale = jnp.where(hit, -tb * inv, 0.0)
    return (g * scale, g * (scale * t_safe), jnp.zeros_like(t),
            jnp.zeros_like(g))


_winner_t.defvjp(_winner_t_fwd, _winner_t_bwd)


def _hits_from_saved(scene, org, dirn, t_saved, pidx):
    """Differentiable Hits from a SAVED winner (t, packed idx): no winner
    search. Gradients w.r.t. (org, dirn) flow through _winner_t; the winner
    geometry g mirrors ops/pallas_intersect._kernel_tx_bwd."""
    n_tri = scene.num_triangles
    hit = jnp.isfinite(t_saved)
    tri_win = (pidx < n_tri) & hit
    i_t = jnp.where(tri_win, pidx, 0)
    i_s = jnp.where(tri_win | ~hit, 0, pidx - n_tri)

    og = jax.lax.stop_gradient(org)
    dg = jax.lax.stop_gradient(dirn)
    if n_tri > 0:
        woop = scene.triangles.woop.reshape(n_tri, 12)
        g_tri = onehot_gather(woop[:, 8:11].T, i_t)  # [3, R]
    else:
        g_tri = jnp.zeros((3,) + t_saved.shape, org.dtype)
    if scene.num_spheres > 0:
        c = onehot_gather(scene.spheres.centre.T, i_s)
        x = og + jnp.where(hit, t_saved, 0.0) * dg
        g_sph = x - c
    else:
        g_sph = jnp.zeros((3,) + t_saved.shape, org.dtype)
    g = jnp.where(tri_win, g_tri, g_sph)

    t = _winner_t(org, dirn, t_saved, g)
    return hits_from_winner(scene, org, dirn, t, tri_win, i_t, i_s)


def _rows_to_state(rows):
    return PathState(
        org=rows[0:3], dirn=rows[3:6], beta=rows[6:9],
        acc=rows[10:13], alive=rows[9] != 0.0,
    )


def _state_to_rows(st: PathState):
    return jnp.concatenate(
        [st.org, st.dirn, st.beta, st.alive.astype(jnp.float32)[None, :],
         st.acc],
        axis=0,
    )


def _make_chain(geo_scene, nb: int, eps: float, interpret: bool,
                kernel_bwd: bool = True):
    """Builds the custom-VJP bounce chain for one (static) geometry.

    ``geo_scene`` carries the CONSTANT geometry (triangles/spheres tables);
    its materials/environment fields are overridden by the chain's explicit
    differentiable inputs, so no tracer is ever closed over.

    ``kernel_bwd``: per-bounce cotangents run through the FUSED Pallas
    backward (ops/pallas_megakernel.bounce_bwd_step — the whole shading
    VJP in VMEM, with per-primitive table gradients mapped back to the
    material table by one mat_id segment-sum here); False keeps the pure
    XLA jax.vjp replay (the reference implementation the kernel is
    parity-tested against, tests/test_replay.py).
    """
    from ..ops.pallas_megakernel import (
        PackedSceneFused,
        bounce_bwd_step,
        fused_bounces,
    )

    def with_params(materials, environment):
        return geo_scene._replace(
            materials=materials, environment=environment
        )

    @jax.custom_vjp
    def chain(materials, environment, state0_rows, unifs):
        acc, _, _ = _forward(materials, environment, state0_rows, unifs)
        return acc

    def _forward(materials, environment, state0_rows, unifs):
        """ALL nb bounces in ONE megakernel dispatch: path state stays in
        VMEM across the chain and the per-bounce replay residuals (input
        states + winner records) are emitted as extra kernel outputs —
        round 3 ran nb separate bounce_step dispatches, whose per-bounce
        HBM round-trips of the [13, N] state made the replay forward 1.9x
        the production forward (VALIDATION.md round 3)."""
        scene = with_params(materials, environment)
        packed = PackedSceneFused(scene)
        n = state0_rows.shape[1]
        # unifs: [nb, 4, N] -> the kernel's [4*nb, N] row table
        unif_rows = unifs.reshape(4 * nb, n)
        acc, cnt, states_big, ts_big, idxs_big = fused_bounces(
            packed, environment,
            state0_rows[0:3], state0_rows[3:6], state0_rows[6:9],
            state0_rows[9] != 0.0, unif_rows, eps, nb,
            interpret=interpret, with_residuals=True,
        )
        # the chain starts from state0's acc rows (zeros in practice); the
        # kernel accumulates from zero, so add the offset back
        acc = acc + state0_rows[10:13]
        states = [
            states_big[13 * d : 13 * (d + 1)]
            + jnp.concatenate(
                [jnp.zeros((10, n), jnp.float32),
                 jnp.broadcast_to(state0_rows[10:13], (3, n))], axis=0
            )
            for d in range(nb)
        ]
        ts = [ts_big[d] for d in range(nb)]
        idxs = [idxs_big[d] for d in range(nb)]
        return acc, jnp.sum(cnt), (states, ts, idxs)

    def chain_fwd(materials, environment, state0_rows, unifs):
        acc, nrays, saved = _forward(materials, environment, state0_rows, unifs)
        states, ts, idxs = saved
        return acc, (materials, environment, unifs, states, ts, idxs)

    def chain_bwd(res, acc_bar):
        materials, environment, unifs, states, ts, idxs = res
        n = acc_bar.shape[1]
        cot_rows = jnp.concatenate(
            [jnp.zeros((10, n), jnp.float32), acc_bar], axis=0
        )
        d_mat = jax.tree.map(jnp.zeros_like, materials)
        d_env = jnp.zeros_like(environment)
        if kernel_bwd:
            scene = with_params(materials, environment)
            packed = PackedSceneFused(scene)
            n_tri, n_sph = packed.n_tri, packed.n_sph
            n_mat = materials.ior.shape[0]
            d_tri_sum = jnp.zeros(
                (packed.tri_coef[0].shape), jnp.float32
            )
            d_sph_sum = jnp.zeros(
                (packed.sph_coef[0].shape), jnp.float32
            )
            for d in reversed(range(nb)):
                cot_rows, d_tri, d_sph, de = bounce_bwd_step(
                    packed, environment, states[d], ts[d], idxs[d],
                    unifs[d], cot_rows, eps, interpret=interpret,
                )
                d_tri_sum = d_tri_sum + d_tri
                d_sph_sum = d_sph_sum + d_sph
                d_env = d_env + de
            # per-primitive table gradients -> material-table gradients:
            # one one-hot segment-sum by mat_id per primitive kind; the
            # geometry rows (woop, vertex normals, sphere centres) are
            # detached by design (as in the XLA path / _kernel_tx_bwd)
            def seg(dtab, rows0, mat_id, count):
                if count == 0:
                    return jnp.zeros((9, n_mat), jnp.float32)
                oh = (
                    mat_id[:, None] == jnp.arange(n_mat, dtype=mat_id.dtype)
                ).astype(jnp.float32)  # [P, M]
                return jnp.dot(
                    dtab[rows0 : rows0 + 9, :count], oh,
                    preferred_element_type=jnp.float32,
                )  # [9, M]

            g9 = seg(d_tri_sum, 21, geo_scene.triangles.mat_id, n_tri) + seg(
                d_sph_sum, 3, geo_scene.spheres.mat_id, n_sph
            )
            d_mat = type(materials)(
                emission=g9[0:3].T.astype(materials.emission.dtype),
                diffuse=g9[3:6].T.astype(materials.diffuse.dtype),
                ior=g9[6].astype(materials.ior.dtype),
                reflectivity=g9[7].astype(materials.reflectivity.dtype),
                cone_angle=g9[8].astype(materials.cone_angle.dtype),
            )
            return d_mat, d_env, cot_rows, jnp.zeros_like(unifs)
        for d in reversed(range(nb)):
            st_rows, t_d, i_d, u_d = states[d], ts[d], idxs[d], unifs[d]

            def f(mats, env, rows):
                scene = with_params(mats, env)
                state = _rows_to_state(rows)
                hits = _hits_from_saved(
                    scene, state.org, state.dirn, t_d, i_d
                )
                # u_d rows: (u, acos u, v, p) — the scan tail consumes
                # (u, v, p); acos is a kernel-side precompute
                new = bounce_from_hits(
                    scene, state, hits, u_d[0], u_d[2], u_d[3],
                    kill_dead=True,
                )
                return _state_to_rows(new)

            _, vjp = jax.vjp(f, materials, environment, st_rows)
            dm, de, cot_rows = vjp(cot_rows)
            d_mat = jax.tree.map(jnp.add, d_mat, dm)
            d_env = d_env + de
        return d_mat, d_env, cot_rows, jnp.zeros_like(unifs)

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def trace_pass_replay(
    scene,
    camera,
    params: RenderParams,
    key: jax.Array,
    px: jnp.ndarray,
    py: jnp.ndarray,
    tri_chunk: int = 1024,
    with_ray_count: bool = False,
    kernel_bwd: bool = True,
):
    """Differentiable 1-spp pass with the FUSED Pallas forward — drop-in
    for integrator.trace_pass on the training path (same RNG streams, same
    estimator, kill_dead always on). Differentiable w.r.t. scene.materials,
    scene.environment and the camera."""
    nu = params.first_bounce_u_samples
    nv = params.first_bounce_v_samples
    k = nu * nv
    eps = params.epsilon
    r0 = px.shape[0]
    dtype = camera.centre.dtype

    backend = resolve_intersector(params, scene)
    assert backend.startswith("pallas"), "replay path needs the Pallas kernels"
    interpret = backend.endswith("interpret")

    # --- camera + first hit + stratified K expansion: identical streams
    # and math to integrator.trace_pass (kill_dead variant) ---
    cam_u = rng.uniforms(rng.stream_key(key, rng.CAMERA_STREAM), (4, r0), dtype)
    org0, dir0 = generate_rays(camera, px, py, cam_u)
    hits0 = intersect_scene(scene, org0, dir0, eps, tri_chunk, backend)
    mat0 = gather_materials(scene.materials, hits0.mat_id)
    env = scene.environment
    miss_colour = jnp.broadcast_to(env[:, None], (3, r0)).astype(dtype)
    if params.preview:
        return jnp.where(hits0.hit, mat0.diffuse, miss_colour).T

    fb_u = rng.uniforms(
        rng.stream_key(key, rng.FIRST_BOUNCE_STREAM), (3, r0, k), dtype
    )
    iu = (jnp.arange(k, dtype=dtype) // nv).reshape(1, k)
    iv = (jnp.arange(k, dtype=dtype) % nv).reshape(1, k)
    u0 = (iu + fb_u[0]) / nu
    v0 = (iv + fb_u[1]) / nv
    p0 = fb_u[2]
    refl0 = effective_reflectivity(mat0, hits0, dir0)
    spec0 = (p0 < refl0[:, None]).reshape(-1)

    def expand(x):
        return jnp.repeat(x, k, axis=-1)

    hits0x = Hits(*(expand(f) for f in hits0))
    mat0x = GatheredMat(*(expand(f) for f in mat0))
    dir1 = sample_direction(
        mat0x, hits0x, expand(dir0), u0.reshape(-1), v0.reshape(-1), spec0
    )
    beta1 = jnp.where(
        spec0, jnp.ones((3, r0 * k), dtype), mat0x.diffuse
    ) * branch_weight(expand(refl0), spec0)
    alive1 = hits0x.hit & jnp.any(beta1 != 0.0, axis=0)
    state0_rows = jnp.concatenate(
        [
            hits0x.pos.astype(jnp.float32),
            dir1.astype(jnp.float32),
            beta1.astype(jnp.float32),
            alive1.astype(jnp.float32)[None, :],
            jnp.zeros((3, r0 * k), jnp.float32),
        ],
        axis=0,
    )  # [13, R*K]

    nb = max(params.max_depth - 1, 0)
    nrays = jnp.asarray(
        r0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    )
    if nb == 0:
        acc = jnp.zeros((3, r0 * k), dtype)
    else:
        bkey = rng.stream_key(key, rng.BOUNCE_STREAM_BASE)
        rows = []
        for d in range(1, nb + 1):
            bu = rng.uniforms(jax.random.fold_in(bkey, d), (3, r0 * k), dtype)
            acos_u = jnp.arccos(jnp.clip(bu[0], 0.0, 1.0))
            rows.append(jnp.stack([bu[0], acos_u, bu[1], bu[2]]))
        unifs = jnp.stack(rows)  # [nb, 4, R*K]
        # NOTE a liveness lane sort (pack camera-alive lanes first so
        # tiles are all-live/all-dead) was tried and reverted in round 4:
        # raster order already clusters an open scene's dead sky regions
        # into all-dead tiles for the kernels' any(alive)/any(hit) skips,
        # and the [13+16+3, N] permutation gathers cost ~30 ms/pass at
        # 256^2 (TPU gathers; the feedback sort in the megakernel path
        # amortises the same cost over 64 fused passes).
        chain = _make_chain(scene, nb, float(eps), interpret, kernel_bwd)
        acc = chain(scene.materials, scene.environment, state0_rows, unifs)
        # live-lane count: alive1 enters bounce 1; later bounces are inside
        # the chain (forward-only bookkeeping, recomputed cheaply here)
        nrays = nrays + jnp.sum(alive1.astype(nrays.dtype))

    path_mean = acc.reshape(3, r0, k).mean(axis=2)
    hit_colour = mat0.emission + path_mean
    radiance = jnp.where(hits0.hit, hit_colour, miss_colour).T
    if with_ray_count:
        return radiance, nrays
    return radiance


# ---------------------------------------------------------------------------
# REGENERATING multi-pass replay (round-5): the training-path analogue of
# the production regen megakernel. trace_pass_replay above dispatches all
# nb bounces for every lane of ONE sample pass (mean path lifetime 1.23 of
# nb=4 on suzanne -> ~70% dead bounce work, the round-4 verdict's missed
# <=3x fused-training bar). trace_passes_replay runs S sample passes in
# one regenerating dispatch: a lane whose path dies immediately reloads
# the next sample's first-bounce state, residuals are recorded per
# REALIZED kernel iteration, and the backward walks only those realized
# events in reverse (ops/pallas_megakernel.regen_replay_bwd), resetting
# the state cotangent at sample-segment boundaries.
#
# Estimator: identical to the production forward
# (integrator.trace_passes_fused with rng_mode="kernel", no sort/tail) —
# counter-RNG bounce streams, camera/first-bounce streams from the same
# fold_in chain. The acc cotangent needs no per-sample bookkeeping: the
# returned radiance is the SUM over samples, so d(loss)/d(acc_s) is the
# same [3] row for every sample of a lane.
#
# Reference being beaten: the recursive per-sample loop
# src/oo/Renderer.cpp:60-141.
# ---------------------------------------------------------------------------


def _f0(x):
    import numpy as np

    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _make_regen_chain(geo_scene, nb: int, s_count: int, eps: float,
                      interpret: bool, kernel_bwd: bool = True):
    """Custom-VJP bounce chain for the regen replay: (materials, env,
    state0 [S*10, N]) -> (acc [3, N], cnt [N]). lane_ids / key words /
    sample0 ride along as non-differentiable (float0-cotangent) inputs."""
    from ..ops import kernel_rng as kr
    from ..ops.pallas_megakernel import (
        RRES,
        PackedSceneFused,
        fused_passes_krng,
        regen_replay_bwd,
    )

    def with_params(materials, environment):
        return geo_scene._replace(materials=materials, environment=environment)

    def _forward(materials, environment, state0, lane_ids, k0, k1, sample0,
                 order, inv):
        # FEEDBACK WORK-SORT, inside the custom-VJP boundary: ``order``
        # permutes lanes into work-homogeneous kernel tiles (the
        # production forward's occupancy lever — suzanne 56 -> 38 ms/pass)
        # and ``inv`` unsorts the outputs. Residuals stay in SORTED lane
        # space; the backward walks them there and unsorts only its
        # d_state0 — every transpose is a plain gather (a permutation's
        # transpose is its inverse permutation), never a scatter-add.
        if order is not None:
            state0 = jnp.take(state0, order, axis=1)
            lane_ids = jnp.take(lane_ids, order)
        packed = PackedSceneFused(with_params(materials, environment))
        acc, cnt, resid, nit = fused_passes_krng(
            packed, environment, state0, lane_ids, (k0, k1), sample0,
            eps, nb, s_count, interpret=interpret, replay=True,
        )
        if order is not None:
            acc = jnp.take(acc, inv, axis=1)
            cnt = jnp.take(cnt, inv)
        return acc, cnt, resid, nit, lane_ids

    @jax.custom_vjp
    def chain(materials, environment, state0, lane_ids, k0, k1, sample0,
              order, inv):
        # UNDIFFERENTIATED path: skip the residual emission entirely — the
        # replay=False kernel is bit-identical on (acc, cnt) (the primal
        # parity test pins this) and avoids writing the RRES*S*nb-row
        # residual table for forward-only evaluations.
        if order is not None:
            state0 = jnp.take(state0, order, axis=1)
            lane_ids = jnp.take(lane_ids, order)
        packed = PackedSceneFused(with_params(materials, environment))
        acc, cnt = fused_passes_krng(
            packed, environment, state0, lane_ids, (k0, k1), sample0,
            eps, nb, s_count, interpret=interpret,
        )
        if order is not None:
            acc = jnp.take(acc, inv, axis=1)
            cnt = jnp.take(cnt, inv)
        return acc, cnt

    def chain_fwd(materials, environment, state0, lane_ids, k0, k1, sample0,
                  order, inv):
        acc, cnt, resid, nit, lane_sorted = _forward(
            materials, environment, state0, lane_ids, k0, k1, sample0,
            order, inv,
        )
        return (acc, cnt), (
            materials, environment, lane_sorted, k0, k1, sample0, resid, nit,
            order, inv,
        )

    def chain_bwd(res, cots):
        (materials, environment, lane_ids, k0, k1, sample0, resid, nit,
         order, inv) = res
        acc_bar, _cnt_bar = cots  # cnt is integer-valued: float0, ignored
        if order is not None:
            # into sorted lane space (matching the residuals)
            acc_bar = jnp.take(acc_bar, order, axis=1)
        n = acc_bar.shape[1]
        scene = with_params(materials, environment)
        packed = PackedSceneFused(scene)
        n_tri, n_sph = packed.n_tri, packed.n_sph
        n_mat = materials.ior.shape[0]

        def seg(dtab, rows0, mat_id, count):
            # per-primitive table gradients -> material-table gradients
            # (one one-hot segment-sum per primitive kind, as in the
            # single-pass chain above; geometry rows detached by design)
            if count == 0:
                return jnp.zeros((9, n_mat), jnp.float32)
            oh = (
                mat_id[:, None] == jnp.arange(n_mat, dtype=mat_id.dtype)
            ).astype(jnp.float32)  # [P, M]
            return jnp.dot(
                dtab[rows0 : rows0 + 9, :count], oh,
                preferred_element_type=jnp.float32,
            )

        if kernel_bwd:
            d_state0, d_tri, d_sph, d_env = regen_replay_bwd(
                packed, environment, lane_ids, (k0, k1), sample0,
                resid, nit, acc_bar, eps, nb, s_count, interpret=interpret,
            )
            g9 = seg(d_tri, 21, geo_scene.triangles.mat_id, n_tri) + seg(
                d_sph, 3, geo_scene.spheres.mat_id, n_sph
            )
            d_mat = type(materials)(
                emission=g9[0:3].T.astype(materials.emission.dtype),
                diffuse=g9[3:6].T.astype(materials.diffuse.dtype),
                ior=g9[6].astype(materials.ior.dtype),
                reflectivity=g9[7].astype(materials.reflectivity.dtype),
                cone_angle=g9[8].astype(materials.cone_angle.dtype),
            )
        else:
            # XLA REFERENCE backward (test oracle / fallback): the same
            # reverse walk in plain jnp via the proven bounce_from_hits
            # replay formulation, NIT statically unrolled.
            NIT = s_count * nb
            nit_lane = nit[0, :n]
            seeds = kr.channel_seeds(
                jnp.asarray(k0, jnp.uint32), jnp.asarray(k1, jnp.uint32)
            )
            lane_row = lane_ids.astype(jnp.uint32).reshape(1, n)
            prev_s = jnp.full((n,), -1, jnp.int32)
            cot = jnp.concatenate(
                [jnp.zeros((10, n), jnp.float32), acc_bar], axis=0
            )
            d0 = jnp.zeros((s_count, 9, n), jnp.float32)
            d_mat = jax.tree.map(jnp.zeros_like, materials)
            d_env = jnp.zeros_like(environment)
            for j in reversed(range(NIT)):
                blk = resid[RRES * j : RRES * (j + 1), :n]
                jvalid = j < nit_lane
                s = jnp.where(jvalid, blk[11].astype(jnp.int32), s_count)
                active = jvalid & (s < s_count)
                af = active.astype(jnp.float32)
                d_cur = jnp.where(active, blk[12].astype(jnp.int32), 1)
                t_saved = jnp.where(active, blk[9], _INF)
                pidx = jnp.where(active, blk[10].astype(jnp.int32), 0)
                newseg = active & (s != prev_s)
                cot = jnp.concatenate([
                    jnp.where(newseg[None, :], 0.0, cot[0:10]),
                    jnp.where(active[None, :], acc_bar, cot[10:13]),
                ], axis=0)
                sd_row = (
                    ((sample0 + s) * 256 + d_cur).astype(jnp.uint32)
                ).reshape(1, n)
                u, v, p_ev = kr.event_uniforms_rows(lane_row, sd_row, seeds)
                # Sanitise with WHERE, not multiplication: slots past a
                # tile's realized n_it are uninitialised HBM and may hold
                # NaN, which `* af` keeps (NaN * 0 == NaN). Inactive lanes
                # get a UNIT direction, not zero: the normalise/ONB chains
                # downstream have inf partials at 0 that jnp.where would
                # NOT stop (the kernel body carries its own pad-lane
                # substitutions for this).
                am = active[None, :]
                st_rows = jnp.concatenate(
                    [jnp.where(am, blk[0:3], 0.0),
                     jnp.where(am, blk[3:5], 0.0),
                     jnp.where(active, blk[5], 1.0)[None, :],
                     jnp.where(am, blk[6:9], 0.0), af[None, :],
                     jnp.zeros((3, n), jnp.float32)], axis=0,
                )

                def f(mats, env, rows, t_j=t_saved, i_j=pidx, u_j=u,
                      v_j=v, p_j=p_ev):
                    sc = with_params(mats, env)
                    state = _rows_to_state(rows)
                    hits = _hits_from_saved(
                        sc, state.org, state.dirn, t_j, i_j
                    )
                    new = bounce_from_hits(
                        sc, state, hits, u_j, v_j, p_j, kill_dead=True
                    )
                    return _state_to_rows(new)

                _, vjp = jax.vjp(f, materials, environment, st_rows)
                dm, de, cin = vjp(cot)
                d_mat = jax.tree.map(jnp.add, d_mat, dm)
                d_env = d_env + de
                segstart = active & (d_cur == 1)
                smask = (
                    jnp.arange(s_count, dtype=jnp.int32)[:, None, None]
                    == s[None, None, :]
                ) & segstart[None, None, :]
                d0 = jnp.where(smask, cin[None, 0:9, :], d0)
                cot = jnp.where(active[None, :], cin, cot)
                prev_s = jnp.where(active, s, prev_s)
            d_state0 = jnp.concatenate(
                [d0, jnp.zeros((s_count, 1, n), jnp.float32)], axis=1
            ).reshape(10 * s_count, n)
        if order is not None:
            d_state0 = jnp.take(d_state0, inv, axis=1)
        return (d_mat, d_env, d_state0,
                _f0(lane_ids), _f0(k0), _f0(k1), _f0(sample0),
                None if order is None else _f0(order),
                None if inv is None else _f0(inv))

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def trace_passes_replay(
    scene,
    camera,
    params: RenderParams,
    base_key: jax.Array,
    sample0,
    tile_idx,
    px: jnp.ndarray,
    py: jnp.ndarray,
    n_passes: int,
    tri_chunk: int = 1024,
    with_ray_count: bool = False,
    kernel_bwd: bool = True,
    sort_key: jnp.ndarray | None = None,
    with_lane_counts: bool = False,
):
    """Differentiable ``n_passes`` sample passes with the REGENERATING
    replay chain — the training-path drop-in for
    integrator.trace_passes_fused (rng_mode="kernel", no tail).
    Returns the radiance SUM over the passes [R, 3]; differentiable
    w.r.t. scene.materials, scene.environment and the camera.

    ``sort_key`` [r0*k]: the FEEDBACK WORK-SORT (see trace_passes_fused).
    The permutation is bit-exact for the primal and exact for gradients
    (handled inside the chain's custom VJP with gather-only transposes);
    chain the returned lane counts (``with_lane_counts``) across training
    steps exactly as the render loop does across dispatches."""
    from ..ops import kernel_rng
    from .integrator import _first_bounce_state

    backend = resolve_intersector(params, scene)
    assert backend.startswith("pallas"), "replay path needs the Pallas kernels"
    interpret = backend.endswith("interpret")
    nb = max(params.max_depth - 1, 0)
    k = params.first_bounce_samples
    r0 = px.shape[0]
    dtype = camera.centre.dtype

    def pass_state(base_acc, s):
        key = jax.random.fold_in(
            jax.random.fold_in(base_key, sample0 + s), tile_idx
        )
        st_rows, base, _ = _first_bounce_state(
            scene, camera, params, key, px, py, tri_chunk, backend,
            want_unif=False,
        )
        return base_acc + base, st_rows

    base_sum, states = jax.lax.scan(
        pass_state, jnp.zeros((3, r0), dtype), jnp.arange(n_passes)
    )
    nrays = jnp.asarray(
        n_passes * r0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    )
    if nb == 0:
        radiance = base_sum.T
        out = (radiance,)
        if with_ray_count:
            out = out + (nrays,)
        if with_lane_counts:
            out = out + (jnp.zeros((r0 * k,), jnp.int32),)
        return out if len(out) > 1 else radiance

    state0 = states.reshape(-1, r0 * k)  # [S*10, N]
    lane_ids = (
        (py * params.width + px).astype(jnp.int32)[:, None] * k
        + jnp.arange(k, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    if sort_key is not None:
        order = jnp.argsort(-sort_key)
        inv = (
            jnp.zeros_like(order)
            .at[order]
            .set(jnp.arange(order.shape[0], dtype=order.dtype))
        )
    else:
        order = inv = None
    kkey = rng.stream_key(base_key, rng.KERNEL_RNG_STREAM)
    k0, k1 = kernel_rng.key_words(kkey)
    chain = _make_regen_chain(
        scene, nb, int(n_passes), float(params.epsilon), interpret,
        kernel_bwd,
    )
    acc, cnt = chain(
        scene.materials, scene.environment, state0, lane_ids, k0, k1,
        jnp.asarray(sample0, jnp.int32), order, inv,
    )
    path_mean = acc.reshape(3, r0, k).mean(axis=2)
    radiance = (base_sum + path_mean).T
    out = (radiance,)
    if with_ray_count:
        out = out + (nrays + jnp.sum(cnt),)
    if with_lane_counts:
        out = out + (cnt,)
    return out if len(out) > 1 else radiance
