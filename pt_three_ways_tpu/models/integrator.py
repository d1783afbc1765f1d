"""Wavefront path integrator — the flagship ("dod") way.

The reference's recursive radiance (src/dod/Scene.cpp:124-179,
src/oo/Renderer.cpp:60-91) is restructured for the TPU as a wavefront:
SoA buffers of (origin, direction, throughput, accumulator, alive) for every
path, one bounce per ``lax.scan`` iteration, no data-dependent control flow.
All per-ray data is component-major ([3, N] vectors, [N] scalar fields — see
ops/vecmath.py for why). The estimator is *identical* to the reference:

  * camera ray -> first hit; miss returns the environment colour
    (Renderer.cpp:66-67); preview returns the material diffuse.
  * stratified firstBounceU x firstBounceV (u,v) grid at depth 0
    (Renderer.cpp:63-64, 78-81) expressed as K-fold ray multiplicity sharing
    the first hit; 1 sample per bounce thereafter.
  * per event: p < reflectivity (Fresnel via reflectance() with IORs swapped
    when inside — Material.cpp:31-35 — or fixed mat.reflectivity when >= 0)
    chooses a cone sample around the mirror direction (NOT tinted by
    diffuse) vs a cosine hemisphere sample tinted by diffuse
    (Material.cpp:38-48, dod/Scene.cpp:140-178).
  * emission added unconditionally per shading event (Material.cpp:18-21).
  * hard depth cutoff returning black (Renderer.cpp:61-62). No NEE, no
    Russian roulette, no refraction — exactly the three-ways model (the
    smallpt sidecar in models/smallpt.py adds RR + refraction).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rng
from ..ops.camera import Camera, generate_rays
from ..ops.gather import onehot_gather
from ..ops.intersect import Hits, intersect_scene
from ..ops.vecmath import (
    Onb,
    cone_sample,
    hemisphere_sample,
    onb_from_z,
    reflect,
    reflectance,
    vec3,
)
from ..utils.render_params import RenderParams


def resolve_intersector(params: RenderParams, scene=None) -> str:
    """'auto' -> the fused Pallas kernel on TPU, XLA elsewhere.

    With ``scene``, a real-hardware 'pallas' additionally requires the
    scene's broadcast tables to fit the per-program VMEM budget
    (ops/pallas_megakernel.scene_table_bytes, 48 B/tri intersect-only);
    over-budget scenes fall back to the XLA chunked scan, which is
    unbounded in N like the reference's linear loop
    (src/dod/Scene.cpp:51-113). 'pallas-interpret' never falls back (it
    has no VMEM)."""
    mode = params.intersector
    if mode == "auto":
        mode = "pallas" if jax.default_backend() == "tpu" else "xla"
    if mode == "pallas" and scene is not None:
        from ..ops.pallas_megakernel import scene_fits_pallas

        if not scene_fits_pallas(scene, fused=False):
            return "xla"
    return mode


def uses_stream(params: RenderParams, scene) -> bool:
    """True when the regenerating megakernel runs in STREAMING mode:
    the scene's broadcast tables exceed the VMEM budget, so triangles are
    DMA'd HBM->VMEM in windows with per-window AABB skip and in-loop
    attribute capture (ops/pallas_megakernel._stream_tri). Requires the
    in-kernel RNG (the uniform-table mode would need the over-budget
    tables anyway)."""
    if (
        scene is None
        or params.preview
        or params.fused == "off"
        or not params.kill_dead_paths
    ):
        return False
    mode = params.intersector
    if mode == "auto":
        mode = "pallas" if jax.default_backend() == "tpu" else "xla"
    if not mode.startswith("pallas"):
        return False
    if resolve_rng_mode(params) != "kernel":
        return False
    from ..ops.pallas_megakernel import scene_fits_pallas

    return not scene_fits_pallas(scene, fused=True)


def resolve_rng_mode(params: RenderParams) -> str:
    """'auto' -> in-kernel counter RNG for the regen megakernel ('kernel');
    'table' keeps the precomputed-uniform path that is bit-compatible with
    the lax.scan wavefront (kept for the estimator-equivalence tests)."""
    if params.rng_mode == "auto":
        return "kernel"
    return params.rng_mode


class GatheredMat(NamedTuple):
    emission: jnp.ndarray  # [3, R]
    diffuse: jnp.ndarray  # [3, R]
    ior: jnp.ndarray  # [R]
    reflectivity: jnp.ndarray  # [R]
    cone_angle: jnp.ndarray  # [R]


def gather_materials(table, mat_id: jnp.ndarray) -> GatheredMat:
    """All 9 material scalars for every ray in ONE one-hot matmul
    (ops/gather.py — ~100x faster than TPU gathers)."""
    coef = jnp.concatenate(
        [
            table.emission.T,  # [3, M]
            table.diffuse.T,  # [3, M]
            table.ior[None, :],
            table.reflectivity[None, :],
            table.cone_angle[None, :],
        ],
        axis=0,
    )  # [9, M]
    g = onehot_gather(coef, mat_id)
    return GatheredMat(
        emission=g[0:3],
        diffuse=g[3:6],
        ior=g[6],
        reflectivity=g[7],
        cone_angle=g[8],
    )


def effective_reflectivity(
    mat: GatheredMat, hits: Hits, dirn: jnp.ndarray
) -> jnp.ndarray:
    """Fresnel-or-fixed event probability (dod/Scene.cpp:140-146)."""
    one = jnp.ones_like(mat.ior)
    ior_from = jnp.where(hits.inside, mat.ior, one)
    ior_to = jnp.where(hits.inside, one, mat.ior)
    fresnel = reflectance(hits.normal, dirn, ior_from, ior_to)
    return jnp.where(mat.reflectivity < 0.0, fresnel, mat.reflectivity)


def branch_weight(refl: jnp.ndarray, spec: jnp.ndarray) -> jnp.ndarray:
    """Likelihood-ratio weight for the sampled event branch.

    The event choice ``p < refl`` is discrete, so gradients of the expected
    radiance w.r.t. anything that moves ``refl`` (Fresnel -> camera/geometry,
    ior, fixed reflectivity) would otherwise vanish. Multiplying the
    throughput by ``P_chosen / stop_grad(P_chosen)`` is exactly 1.0 in the
    primal (images are bit-unchanged) but contributes the pdf-derivative term
    in the backward pass — the standard path-replay estimator for discrete
    decisions. Unreachable branches (refl==0 or 1) are guarded.
    """
    refl_hat = jax.lax.stop_gradient(refl)
    return jnp.where(
        spec,
        refl / jnp.maximum(refl_hat, 1e-12),
        (1.0 - refl) / jnp.maximum(1.0 - refl_hat, 1e-12),
    )


def sample_direction(
    mat: GatheredMat,
    hits: Hits,
    dirn: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    spec: jnp.ndarray,
) -> jnp.ndarray:
    """Branch-free cone-vs-hemisphere next direction (Material.cpp:36-48).

    The fused camera stage (_first_bounce_state) carries its own hoisted
    per-pixel form of this select (with a static no-glossy fast path
    mirroring cone_sample's Samples.cpp:9 mirror early-out); this generic
    per-lane form serves the scan wavefront and the replay oracles."""
    cone_dir = cone_sample(reflect(dirn, hits.normal), mat.cone_angle, u, v)
    hemi_dir = hemisphere_sample(onb_from_z(hits.normal), u, v)
    return jnp.where(spec, cone_dir, hemi_dir)


def _static_no_glossy(materials) -> bool:
    """Concrete-materials check for the no-glossy fast path (False under
    tracers — correct either way, just slower)."""
    if isinstance(materials.cone_angle, jax.core.Tracer):
        return False
    import numpy as _np

    from ..ops.vecmath import EPSILON as _VEPS

    ca = _np.asarray(materials.cone_angle)
    return bool(ca.size == 0 or float(ca.max()) < _VEPS)


class PathState(NamedTuple):
    org: jnp.ndarray  # [3, N]
    dirn: jnp.ndarray  # [3, N]
    beta: jnp.ndarray  # [3, N] throughput
    acc: jnp.ndarray  # [3, N] accumulated radiance
    alive: jnp.ndarray  # [N] bool


def bounce(
    scene,
    state: PathState,
    u,
    v,
    p,
    eps: float,
    tri_chunk: int,
    backend: str = "xla",
    kill_dead: bool = True,
) -> PathState:
    """One wavefront bounce: intersect all live paths, accumulate emission /
    environment, sample continuation directions.

    Dead lanes are masked, never branched — fixed shapes keep XLA happy; the
    Pallas intersector additionally SKIPS dead lanes (whole-tile early-out +
    per-lane best_t seeding, ops/pallas_intersect.py), so masked lanes cost
    almost nothing on TPU.
    """
    hits = intersect_scene(
        scene, state.org, state.dirn, eps, tri_chunk, backend, live=state.alive
    )
    return bounce_from_hits(scene, state, hits, u, v, p, kill_dead)


def bounce_from_hits(
    scene, state: PathState, hits: Hits, u, v, p, kill_dead: bool = True
) -> PathState:
    """The post-intersection bounce tail, shared by the scan wavefront
    (above) and the path-replay backward (models/replay.py), which replays
    this exact function at the SAVED winners instead of re-intersecting."""
    live_hit = state.alive & hits.hit
    live_miss = state.alive & ~hits.hit

    mat = gather_materials(scene.materials, hits.mat_id)
    env = scene.environment[:, None]
    acc = state.acc
    acc = acc + jnp.where(live_miss, state.beta * env, 0.0)
    acc = acc + jnp.where(live_hit, state.beta * mat.emission, 0.0)

    refl = effective_reflectivity(mat, hits, state.dirn)
    spec = p < refl
    new_dir = sample_direction(mat, hits, state.dirn, u, v, spec)
    w = branch_weight(refl, spec)
    new_beta = jnp.where(spec, state.beta, state.beta * mat.diffuse) * w

    # Zero-throughput kill: a path whose throughput is exactly 0 on every
    # channel can contribute exactly 0 downstream, so drop it. The reference
    # keeps recursing and multiplies the result by diffuse == 0
    # (dod/Scene.cpp:168-174) — identical estimator, wasted work. This is
    # what makes light-dominated scenes (ce: every camera ray starts inside
    # an emissive sphere with zero diffuse) collapse to ~one bounce.
    # ``kill_dead=False`` in differentiable renders (see RenderParams).
    alive = live_hit
    if kill_dead:
        alive = alive & jnp.any(new_beta != 0.0, axis=0)

    return PathState(
        org=jnp.where(live_hit, hits.pos, state.org),
        dirn=jnp.where(live_hit, new_dir, state.dirn),
        beta=jnp.where(live_hit, new_beta, state.beta),
        acc=acc,
        alive=alive,
    )


def trace_pass(
    scene,
    camera: Camera,
    params: RenderParams,
    key: jax.Array,
    px: jnp.ndarray,  # [R] pixel x of each camera ray in this tile
    py: jnp.ndarray,  # [R] pixel y
    tri_chunk: int = 1024,
    with_ray_count: bool = False,
):
    """One 1-spp pass over a tile of pixels -> radiance [R, 3].

    ``params`` fields used here (max_depth, first-bounce strata, preview,
    epsilon) are Python statics baked into the trace. With
    ``with_ray_count=True`` also returns the number of live rays traced
    (camera rays + alive path lanes entering each bounce) for throughput
    accounting.
    """
    nu = params.first_bounce_u_samples
    nv = params.first_bounce_v_samples
    k = nu * nv
    eps = params.epsilon
    r0 = px.shape[0]
    dtype = camera.centre.dtype

    backend = resolve_intersector(params, scene)
    cam_u = rng.uniforms(rng.stream_key(key, rng.CAMERA_STREAM), (4, r0), dtype)
    org0, dir0 = generate_rays(camera, px, py, cam_u)
    hits0 = intersect_scene(scene, org0, dir0, eps, tri_chunk, backend)
    mat0 = gather_materials(scene.materials, hits0.mat_id)

    env = scene.environment
    miss_colour = jnp.broadcast_to(env[:, None], (3, r0)).astype(dtype)
    if params.preview:
        return jnp.where(hits0.hit, mat0.diffuse, miss_colour).T

    # --- first bounce: stratified K-fold expansion sharing the first hit ---
    fb_u = rng.uniforms(
        rng.stream_key(key, rng.FIRST_BOUNCE_STREAM), (3, r0, k), dtype
    )
    iu = (jnp.arange(k, dtype=dtype) // nv).reshape(1, k)
    iv = (jnp.arange(k, dtype=dtype) % nv).reshape(1, k)
    u0 = (iu + fb_u[0]) / nu  # [R, K]
    v0 = (iv + fb_u[1]) / nv
    p0 = fb_u[2]

    refl0 = effective_reflectivity(mat0, hits0, dir0)  # [R]
    spec0 = p0 < refl0[:, None]  # [R, K]

    def expand(x):
        """[.., R] -> [.., R*K] (trailing axis fan-out, (r, k) order)."""
        return jnp.repeat(x, k, axis=-1)

    hits0x = Hits(*(expand(f) for f in hits0))
    mat0x = GatheredMat(*(expand(f) for f in mat0))
    dir0x = expand(dir0)
    spec0f = spec0.reshape(-1)
    dir1 = sample_direction(
        mat0x, hits0x, dir0x, u0.reshape(-1), v0.reshape(-1), spec0f
    )
    refl0x = expand(refl0)
    beta1 = jnp.where(
        spec0f, jnp.ones((3, r0 * k), dtype), mat0x.diffuse
    ) * branch_weight(refl0x, spec0f)
    alive1 = hits0x.hit
    if params.kill_dead_paths:
        alive1 = alive1 & jnp.any(beta1 != 0.0, axis=0)
    state = PathState(
        org=hits0x.pos,
        dirn=dir1,
        beta=beta1,
        acc=jnp.zeros((3, r0 * k), dtype),
        alive=alive1,
    )

    # --- bounces at depth 1 .. max_depth-1 (depth max_depth returns black) ---
    n_bounces = max(params.max_depth - 1, 0)

    use_fused = (
        backend.startswith("pallas")
        and params.fused != "off"
        and not params.remat
        and params.kill_dead_paths
        and n_bounces > 0
    )
    if use_fused and not backend.endswith("interpret"):
        # the megakernel's bf16x3 attribute tables (~240 B/tri) hit the
        # VMEM ceiling ~5x sooner than the intersect-only tables; between
        # the two ceilings run the scan wavefront with the Pallas intersect
        from ..ops.pallas_megakernel import scene_fits_pallas

        use_fused = scene_fits_pallas(scene, fused=True)
    if use_fused:
        # Fused megakernel: the whole depth chain in one Pallas program per
        # ray tile (ops/pallas_megakernel.py). Identical estimator; the
        # uniforms are precomputed on the SAME streams as the scan below, so
        # the two paths are interchangeable up to f32 rounding order.
        from ..ops.pallas_megakernel import PackedSceneFused, fused_bounces

        packed = PackedSceneFused(scene)
        bkey = rng.stream_key(key, rng.BOUNCE_STREAM_BASE)

        def bounce_rows(d):
            """(u, acos(u), v, p) — acos precomputed outside the kernel so
            the cone-theta mapping is bit-identical to the scan path."""
            bu = rng.uniforms(jax.random.fold_in(bkey, d), (3, r0 * k), dtype)
            acos_u = jnp.arccos(jnp.clip(bu[0], 0.0, 1.0))
            return jnp.stack([bu[0], acos_u, bu[1], bu[2]])

        unif = jnp.concatenate(
            [bounce_rows(d) for d in range(1, n_bounces + 1)], axis=0
        )
        acc, bounce_counts = fused_bounces(
            packed,
            scene.environment,
            state.org,
            state.dirn,
            state.beta,
            state.alive,
            unif,
            eps,
            n_bounces,
            interpret=backend.endswith("interpret"),
        )
        nrays = jnp.asarray(
            r0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        ) + jnp.sum(bounce_counts)
        path_mean = acc.reshape(3, r0, k).mean(axis=2)
        hit_colour = mat0.emission + path_mean
        radiance = jnp.where(hits0.hit, hit_colour, miss_colour).T
        if with_ray_count:
            return radiance, nrays
        return radiance

    def step(carry, d):
        st, nrays = carry
        nrays = nrays + jnp.sum(st.alive)
        bkey = rng.stream_key(key, rng.BOUNCE_STREAM_BASE)
        bu = rng.uniforms(jax.random.fold_in(bkey, d), (3, r0 * k), dtype)
        st = bounce(scene, st, bu[0], bu[1], bu[2], eps, tri_chunk, backend,
                    kill_dead=params.kill_dead_paths)
        return (st, nrays), None

    if params.remat:
        # Path-replay backprop: the backward pass regenerates each bounce's
        # intermediates (hits, samples) from the carried path state + counter
        # RNG instead of storing them — O(path state) memory per bounce.
        step = jax.checkpoint(step)

    nrays = jnp.asarray(r0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
    if n_bounces > 0:
        (state, nrays), _ = jax.lax.scan(
            step, (state, nrays), jnp.arange(1, n_bounces + 1)
        )

    path_mean = state.acc.reshape(3, r0, k).mean(axis=2)
    hit_colour = mat0.emission + path_mean
    radiance = jnp.where(hits0.hit, hit_colour, miss_colour).T
    if with_ray_count:
        return radiance, nrays
    return radiance


def _first_bounce_state(scene, camera, params, key, px, py, tri_chunk, backend,
                        want_unif: bool = True, row_pad: int = 10):
    """Camera stage + stratified K expansion for ONE sample pass.

    Returns (state_rows [row_pad, R*K], rows 0..9 = org3/dir3/beta3/alive1,
             base [3, R] = where(hit0, emission0, env),
             unif_rows [4*nb, R*K]) — all on the same RNG streams as
    trace_pass, so the regenerating megakernel reproduces its estimator.
    ``want_unif=False`` (in-kernel RNG mode) skips the bounce-uniform
    tables. ``row_pad`` pads each sample's state block (both regen kernels
    take the 10-row layout; the krng kernel re-lays it out internally).
    """
    nu = params.first_bounce_u_samples
    nv = params.first_bounce_v_samples
    k = nu * nv
    eps = params.epsilon
    r0 = px.shape[0]
    dtype = camera.centre.dtype

    cam_u = rng.uniforms(rng.stream_key(key, rng.CAMERA_STREAM), (4, r0), dtype)
    org0, dir0 = generate_rays(camera, px, py, cam_u)
    hits0 = intersect_scene(scene, org0, dir0, eps, tri_chunk, backend)
    mat0 = gather_materials(scene.materials, hits0.mat_id)

    env = scene.environment
    miss_colour = jnp.broadcast_to(env[:, None], (3, r0)).astype(dtype)
    base = jnp.where(hits0.hit, mat0.emission, miss_colour)

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
    # K-expansion with PER-PIXEL hoisting: the hemisphere ONB and the
    # mirror direction depend only on the pixel's first hit, so they are
    # built once per pixel and their components expanded — bit-exact
    # (elementwise maps commute with repeat) and ~k x less work than
    # sample_direction on the expanded arrays. Glossy scenes keep the
    # generic per-lane cone path (theta depends on the lane's u draw).
    no_glossy = _static_no_glossy(scene.materials)
    onb0x = Onb(*(expand(c) for c in onb_from_z(hits0.normal)))
    hemi_dir = hemisphere_sample(onb0x, u0.reshape(-1), v0.reshape(-1))
    mirror0x = expand(reflect(dir0, hits0.normal))
    if no_glossy:
        cone_dir = mirror0x
    else:
        cone_dir = cone_sample(
            mirror0x, mat0x.cone_angle, u0.reshape(-1), v0.reshape(-1)
        )
    dir1 = jnp.where(spec0, cone_dir, hemi_dir)
    beta1 = jnp.where(
        spec0, jnp.ones((3, r0 * k), dtype), mat0x.diffuse
    ) * branch_weight(expand(refl0), spec0)
    alive1 = hits0x.hit & jnp.any(beta1 != 0.0, axis=0)

    parts = [
        hits0x.pos.astype(jnp.float32),
        dir1.astype(jnp.float32),
        beta1.astype(jnp.float32),
        alive1.astype(jnp.float32)[None, :],
    ]
    if row_pad > 10:
        parts.append(jnp.zeros((row_pad - 10, r0 * k), jnp.float32))
    state_rows = jnp.concatenate(parts, axis=0)  # [row_pad, R*K]

    nb = max(params.max_depth - 1, 0)
    if not want_unif:
        return state_rows, base, jnp.zeros((0, r0 * k), dtype)
    bkey = rng.stream_key(key, rng.BOUNCE_STREAM_BASE)
    rows = []
    for d in range(1, nb + 1):
        bu = rng.uniforms(jax.random.fold_in(bkey, d), (3, r0 * k), dtype)
        acos_u = jnp.arccos(jnp.clip(bu[0], 0.0, 1.0))
        rows.append(jnp.stack([bu[0], acos_u, bu[1], bu[2]]))
    unif_rows = (
        jnp.concatenate(rows, axis=0)
        if rows
        else jnp.zeros((0, r0 * k), dtype)
    )
    return state_rows, base, unif_rows


def trace_passes_fused(
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
    sort_key: jnp.ndarray | None = None,
    with_lane_counts: bool = False,
):
    """``n_passes`` sample passes in ONE regenerating megakernel dispatch.

    Lanes refill with the next sample's first-bounce state the moment their
    path dies (ops/pallas_megakernel._megakernel_regen), so dead-lane waste
    collapses versus dispatching the passes separately. Keys follow the
    render() chain fold(fold(base, sample0+s), tile_idx); the radiance SUM
    over the passes equals summing trace_pass over the same keys (f32
    order aside).

    ``sort_key`` [r0*k]: FEEDBACK WORK-SORT. A regen tile's while-loop is
    bounded by its longest-lived lane, and realized per-lane bounce totals
    are strongly autocorrelated across dispatches (suzanne: corr 0.96 —
    geometry, not RNG, sets a lane's expected depth). Passing the PREVIOUS
    dispatch's lane counts sorts lanes into work-homogeneous tiles
    (measured waste 57% -> 26% on suzanne). The permutation is bit-exact:
    per-lane kernel output is tile-independent (a skipped pl.when branch
    only skips masked writes), and outputs are unsorted before returning.
    ``with_lane_counts`` additionally returns this dispatch's per-lane
    live-bounce counts (in unsorted lane order) to chain into the next
    dispatch's sort_key.
    """
    from ..ops.pallas_megakernel import (
        PackedSceneFused,
        PackedSceneStream,
        fused_passes,
        fused_passes_krng,
    )

    backend = resolve_intersector(params, scene)
    # STREAMING tier: over-VMEM-budget scenes keep the regen megakernel
    # (triangles DMA'd from HBM in windows); the camera stage uses
    # ``backend`` (Pallas while the intersect-only tables fit, XLA beyond)
    stream = uses_stream(params, scene)
    assert (backend.startswith("pallas") or stream) and not params.preview
    nb = max(params.max_depth - 1, 0)
    k = params.first_bounce_samples
    r0 = px.shape[0]
    use_krng = resolve_rng_mode(params) == "kernel" and nb > 0
    # both regen kernels now take the same [S*10, N] sample-major state
    # (the krng kernel transposes to row-major segments internally)
    row_pad = 10

    packed = PackedSceneStream(scene) if stream else PackedSceneFused(scene)

    # ONE traced copy of the camera/first-bounce stage via lax.scan — not
    # n_passes Python-unrolled copies. Tracing+lowering the unrolled
    # 32-pass graph dominated short CLI runs (minutes on ce) and inflated
    # the compiled program ~n_passes-fold. The scan body is the identical
    # per-pass computation; the base-radiance accumulator rides the carry
    # so the f32 addition order stays left-to-right as before.
    def pass_state(base_acc, s):
        key = jax.random.fold_in(
            jax.random.fold_in(base_key, sample0 + s), tile_idx
        )
        st_rows, base, unif_rows = _first_bounce_state(
            scene, camera, params, key, px, py, tri_chunk, backend,
            want_unif=not use_krng, row_pad=row_pad,
        )
        return base_acc + base, (st_rows, unif_rows)

    base_sum, (states, unifs) = jax.lax.scan(
        pass_state,
        jnp.zeros((3, r0), camera.centre.dtype),
        jnp.arange(n_passes),
    )

    nrays = jnp.asarray(
        n_passes * r0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    )
    lane_counts = jnp.zeros((r0 * k,), jnp.int32)
    if nb == 0:
        radiance = base_sum.T
    else:
        state0 = states.reshape(-1, r0 * k)
        unif = unifs.reshape(-1, r0 * k)
        if use_krng:
            # canonical lane ids: pixel-global, so the in-kernel RNG draws
            # are invariant to dispatch tiling, sharding and the sort below
            lane_ids = (
                (py * params.width + px).astype(jnp.int32)[:, None] * k
                + jnp.arange(k, dtype=jnp.int32)[None, :]
            ).reshape(-1)
        if sort_key is not None:
            order = jnp.argsort(-sort_key)
            # inverse permutation once (scatter of iota); unsorting the
            # outputs then uses plain gathers, which lower better on TPU
            # than scattering the [3, N] radiance
            inv = (
                jnp.zeros_like(order)
                .at[order]
                .set(jnp.arange(order.shape[0], dtype=order.dtype))
            )
            state0 = jnp.take(state0, order, axis=1)
            if use_krng:
                lane_ids = jnp.take(lane_ids, order)
            else:
                unif = jnp.take(unif, order, axis=1)
        if use_krng:
            from ..ops import kernel_rng

            kkey = rng.stream_key(base_key, rng.KERNEL_RNG_STREAM)
            acc, cnts = fused_passes_krng(
                packed,
                scene.environment,
                state0,
                lane_ids,
                kernel_rng.key_words(kkey),
                sample0,
                params.epsilon,
                nb,
                n_passes,
                interpret=backend.endswith("interpret"),
                tail_frac=params.regen_tail_frac,
                tail_levels=params.regen_tail_levels,
                stream=stream,
            )
        else:
            acc, cnts = fused_passes(
                packed,
                scene.environment,
                state0,
                unif,
                params.epsilon,
                nb,
                n_passes,
                interpret=backend.endswith("interpret"),
            )
        if sort_key is not None:
            acc = jnp.take(acc, inv, axis=1)
            cnts = jnp.take(cnts, inv, axis=0)
        path_mean = acc.reshape(3, r0, k).mean(axis=2)
        radiance = (base_sum + path_mean).T
        nrays = nrays + jnp.sum(cnts)
        lane_counts = cnts
    out = (radiance,)
    if with_ray_count:
        out = out + (nrays,)
    if with_lane_counts:
        out = out + (lane_counts,)
    return out if len(out) > 1 else radiance


def trace_passes_compact(
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
):
    """``n_passes`` sample passes through the COMPACTING wavefront.

    Between bounces, live lanes are packed densely with a stable
    argsort+gather in XLA (~0.1 ms per million lanes on v5e) so every
    dispatched kernel tile is fully live and the trailing all-dead tiles
    skip their body (ops/pallas_megakernel._bounce_kernel). The radiance
    accumulator rides inside the path state, so the per-path key chain,
    uniforms and f32 accumulation order are IDENTICAL to trace_pass —
    compaction only permutes lane positions, making this bit-compatible
    with the per-pass megakernel's estimator (reference semantics:
    src/dod/Scene.cpp:124-179).
    """
    from ..ops.pallas_megakernel import PackedSceneFused, bounce_step

    backend = resolve_intersector(params, scene)
    assert backend.startswith("pallas") and not params.preview
    nb = max(params.max_depth - 1, 0)
    k = params.first_bounce_samples
    r0 = px.shape[0]
    n = r0 * k

    packed = PackedSceneFused(scene)
    env = scene.environment
    total = jnp.zeros((3, r0), jnp.float32)
    nrays = jnp.asarray(
        n_passes * r0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    )
    for s in range(n_passes):
        key = jax.random.fold_in(
            jax.random.fold_in(base_key, sample0 + s), tile_idx
        )
        st_rows, base, unif_rows = _first_bounce_state(
            scene, camera, params, key, px, py, tri_chunk, backend
        )
        if nb == 0:
            total = total + base
            continue
        state = jnp.concatenate(
            [st_rows, jnp.zeros((3, n), jnp.float32)], axis=0
        )  # [13, N]
        orig = jnp.arange(n, dtype=jnp.int32)
        for d in range(1, nb + 1):
            # stable partition: live lanes first, raster order preserved
            perm = jnp.argsort(state[9] == 0.0, stable=True)
            state = state[:, perm]
            orig = orig[perm]
            unif_d = unif_rows[4 * (d - 1) : 4 * d][:, orig]
            state, cnt = bounce_step(
                packed, env, state, unif_d, params.epsilon,
                interpret=backend.endswith("interpret"),
            )
            nrays = nrays + jnp.sum(cnt)
        rad = jnp.zeros((3, n), jnp.float32).at[:, orig].set(state[10:13])
        total = total + base + rad.reshape(3, r0, k).mean(axis=2)
    radiance = total.T
    if with_ray_count:
        return radiance, nrays
    return radiance
