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
