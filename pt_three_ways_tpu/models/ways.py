"""The "three ways", re-imagined for TPU.

The reference implements the same estimator three ways to compare styles
(OO virtual dispatch / FP optionals+ranges / DoD SoA batches). Virtual
dispatch and optionals don't exist on a TPU, so our three ways are three
*scheduling strategies* over identical math — the comparison that actually
matters on this hardware:

  * ``dod`` (models/integrator.py) — wavefront: all W*H*K paths advance one
    bounce per lax.scan step. Maximum parallelism, K-fold path memory.
    The flagship; mirrors src/dod/.
  * ``oo``  — scanned megakernel: one lax.scan over the K first-bounce
    substrata, each carrying a full depth chain over W*H paths. K-fold less
    live memory, serialised substrata; the analogue of the OO renderer's
    per-pixel nested sample loops (src/oo/Renderer.cpp:60-91).
  * ``fp``  — trace-time-unrolled functional composition: radiance is a pure
    Python-recursive function (masks replace tl::optional) fully inlined by
    tracing, like src/fp/Render.cpp:47-117's expression-style pipeline.

All three consume identical RNG streams, so for a given seed they produce
bit-identical images up to float reduction order — a cross-validation the
reference could never do (its ways use RNG differently by construction).

Layout: component-major ([3, N] vectors), as everywhere in the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rng
from ..ops.camera import Camera, generate_rays
from ..ops.intersect import intersect_scene
from .integrator import (
    GatheredMat,
    PathState,
    bounce,
    branch_weight,
    effective_reflectivity,
    gather_materials,
    resolve_intersector,
    sample_direction,
    trace_pass,
)


def _camera_stage(scene, camera, params, key, px, py, tri_chunk):
    dtype = camera.centre.dtype
    r0 = px.shape[0]
    cam_u = rng.uniforms(rng.stream_key(key, rng.CAMERA_STREAM), (4, r0), dtype)
    org0, dir0 = generate_rays(camera, px, py, cam_u)
    hits0 = intersect_scene(
        scene, org0, dir0, params.epsilon, tri_chunk, resolve_intersector(params, scene)
    )
    mat0 = gather_materials(scene.materials, hits0.mat_id)
    return org0, dir0, hits0, mat0


def _first_bounce_uniforms(params, key, r0, dtype):
    nu = params.first_bounce_u_samples
    nv = params.first_bounce_v_samples
    k = nu * nv
    fb = rng.uniforms(rng.stream_key(key, rng.FIRST_BOUNCE_STREAM), (3, r0, k), dtype)
    iu = (jnp.arange(k, dtype=dtype) // nv).reshape(1, k)
    iv = (jnp.arange(k, dtype=dtype) % nv).reshape(1, k)
    u0 = (iu + fb[0]) / nu  # [R, K]
    v0 = (iv + fb[1]) / nv
    p0 = fb[2]
    return u0, v0, p0


def _bounce_uniforms(key, d, r0, k, dtype):
    """Same stream as the wavefront way: [3, R0*K] per depth, (r, k) order."""
    bkey = rng.stream_key(key, rng.BOUNCE_STREAM_BASE)
    return rng.uniforms(jax.random.fold_in(bkey, d), (3, r0 * k), dtype).reshape(
        3, r0, k
    )


def trace_pass_oo(scene, camera, params, key, px, py, tri_chunk: int = 1024):
    """Scanned-megakernel way: scan over substrata, chain bounces inside."""
    dtype = camera.centre.dtype
    r0 = px.shape[0]
    k = params.first_bounce_samples
    eps = params.epsilon

    org0, dir0, hits0, mat0 = _camera_stage(
        scene, camera, params, key, px, py, tri_chunk
    )
    miss_colour = jnp.broadcast_to(scene.environment[:, None], (3, r0)).astype(dtype)
    if params.preview:
        return jnp.where(hits0.hit, mat0.diffuse, miss_colour).T

    u0, v0, p0 = _first_bounce_uniforms(params, key, r0, dtype)
    refl0 = effective_reflectivity(mat0, hits0, dir0)
    n_bounces = max(params.max_depth - 1, 0)
    backend = resolve_intersector(params, scene)

    def per_substratum(acc_sum, k_idx):
        spec0 = p0[:, k_idx] < refl0
        dir1 = sample_direction(mat0, hits0, dir0, u0[:, k_idx], v0[:, k_idx], spec0)
        beta1 = jnp.where(
            spec0, jnp.ones((3, r0), dtype), mat0.diffuse
        ) * branch_weight(refl0, spec0)
        state = PathState(
            org=hits0.pos,
            dirn=dir1,
            beta=beta1,
            acc=jnp.zeros((3, r0), dtype),
            alive=hits0.hit,
        )

        def step(st, d):
            bu = _bounce_uniforms(key, d, r0, k, dtype)[:, :, k_idx]
            return bounce(
                scene, st, bu[0], bu[1], bu[2], eps, tri_chunk, backend,
                kill_dead=params.kill_dead_paths,
            ), None

        if n_bounces > 0:
            state, _ = jax.lax.scan(step, state, jnp.arange(1, n_bounces + 1))
        return acc_sum + state.acc, None

    acc_sum, _ = jax.lax.scan(
        per_substratum, jnp.zeros((3, r0), dtype), jnp.arange(k)
    )
    hit_colour = mat0.emission + acc_sum / k
    return jnp.where(hits0.hit, hit_colour, miss_colour).T


def trace_pass_fp(scene, camera, params, key, px, py, tri_chunk: int = 1024):
    """Functional way: radiance as pure recursion, unrolled at trace time.

    Masks play the role of fp's tl::optional (src/fp/Render.cpp:22-73); the
    recursion mirrors fp::radiance (Render.cpp:75-117) directly.
    """
    dtype = camera.centre.dtype
    r0 = px.shape[0]
    k = params.first_bounce_samples
    eps = params.epsilon

    org0, dir0, hits0, mat0 = _camera_stage(
        scene, camera, params, key, px, py, tri_chunk
    )
    miss_colour = jnp.broadcast_to(scene.environment[:, None], (3, r0)).astype(dtype)
    if params.preview:
        return jnp.where(hits0.hit, mat0.diffuse, miss_colour).T

    u0, v0, p0 = _first_bounce_uniforms(params, key, r0, dtype)
    refl0 = effective_reflectivity(mat0, hits0, dir0)

    def radiance(org, dirn, depth, alive, k_idx):
        """Monadic-mask radiance: returns [3, R0]; dead lanes contribute 0."""
        if depth >= params.max_depth:
            return jnp.zeros((3, r0), dtype)
        hits = intersect_scene(
            scene, org, dirn, eps, tri_chunk, resolve_intersector(params, scene),
            live=alive,
        )
        mat = gather_materials(scene.materials, hits.mat_id)
        live_hit = alive & hits.hit
        live_miss = alive & ~hits.hit
        bu = _bounce_uniforms(key, depth, r0, k, dtype)[:, :, k_idx]
        refl = effective_reflectivity(mat, hits, dirn)
        spec = bu[2] < refl
        new_dir = sample_direction(mat, hits, dirn, bu[0], bu[1], spec)
        tint = jnp.where(
            spec, jnp.ones((3, r0), dtype), mat.diffuse
        ) * branch_weight(refl, spec)
        child = radiance(hits.pos, new_dir, depth + 1, live_hit, k_idx)
        hit_val = mat.emission + tint * child
        return jnp.where(
            live_hit,
            hit_val,
            jnp.where(live_miss, miss_colour, 0.0),
        )

    acc = jnp.zeros((3, r0), dtype)
    for k_idx in range(k):
        spec0 = p0[:, k_idx] < refl0
        dir1 = sample_direction(mat0, hits0, dir0, u0[:, k_idx], v0[:, k_idx], spec0)
        tint0 = jnp.where(
            spec0, jnp.ones((3, r0), dtype), mat0.diffuse
        ) * branch_weight(refl0, spec0)
        acc = acc + tint0 * radiance(hits0.pos, dir1, 1, hits0.hit, k_idx)
    hit_colour = mat0.emission + acc / k
    return jnp.where(hits0.hit, hit_colour, miss_colour).T


WAYS = {
    "dod": trace_pass,
    "wavefront": trace_pass,
    "oo": trace_pass_oo,
    "megakernel": trace_pass_oo,
    "fp": trace_pass_fp,
    "functional": trace_pass_fp,
}
