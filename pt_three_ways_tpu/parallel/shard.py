"""Sharded rendering: shard_map over the (dp, sp) mesh.

One fused device program renders ``dp`` independent sample passes, each
sharded spatially over ``sp``, and psums the framebuffer over ``dp`` — the
whole of the reference's thread/future/mutex scheduling collapses into a
single SPMD step with one XLA collective.

RNG: each (dp, sp) shard folds its mesh coordinates into the pass key, so a
fixed seed gives a bit-identical image for a fixed mesh shape, and device
counts change results only statistically (SURVEY.md section 6b.4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import rng
from ..models.ways import WAYS
from ..utils.framebuffer import ArrayOutput
from ..utils.render_params import RenderParams


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def make_sharded_pass_fn(
    scene, camera, params: RenderParams, mesh: Mesh, way: str = "dod",
    tri_chunk: int = 1024,
):
    """Returns fn(key, px, py) -> radiance [R, 3], R divisible by mesh size.

    Each dp replica traces its own pass (key folded with the dp index); the
    returned radiance is the SUM over dp replicas, i.e. a (sum, count=dp)
    framebuffer contribution.
    """
    trace = WAYS[way]
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]

    def shard_fn(key, px, py):
        # px/py arrive as the per-sp-shard slice [R / sp], REPLICATED over dp:
        # every dp replica traces the SAME pixels with a dp-folded key, so the
        # psum below merges independent sample passes of identical pixels
        # (round 1 sharded px over dp too, which summed unrelated pixels).
        dp_idx = jax.lax.axis_index("dp")
        sp_idx = jax.lax.axis_index("sp")
        k = rng.tile_key(rng.tile_key(key, dp_idx), sp_idx)
        radiance = trace(scene, camera, params, k, px, py, tri_chunk)
        # merge sample passes over dp (the reference's operator+= merge,
        # src/util/ArrayOutput.cpp:48-57, as one ICI collective)
        return jax.lax.psum(radiance, "dp")

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("sp"), P("sp")),
        out_specs=P("sp"),
        check_vma=False,
    )
    return jax.jit(sharded), sp


def render_sharded(
    scene,
    camera,
    params: RenderParams,
    mesh: Mesh,
    way: str = "dod",
    tri_chunk: int = 1024,
) -> ArrayOutput:
    """Full sharded render. spp is consumed dp passes at a time."""
    width, height = params.width, params.height
    n_pix = width * height
    dp = mesh.shape["dp"]

    pass_fn, n_shards = make_sharded_pass_fn(scene, camera, params, mesh, way, tri_chunk)

    padded = _pad_to(n_pix, n_shards)
    xs = np.arange(padded, dtype=np.int32) % width
    ys = np.minimum(np.arange(padded, dtype=np.int32) // width, height - 1)
    px = jnp.asarray(xs)
    py = jnp.asarray(ys)

    out = ArrayOutput(width, height)
    base = rng.base_key(params.seed)
    n_rounds = -(-params.samples_per_pixel // dp)
    for r in range(n_rounds):
        key = rng.pass_key(base, r)
        rad = np.asarray(pass_fn(key, px, py), np.float64)[:n_pix]
        # A round delivers dp samples per pixel; trim overshoot by scaling
        # is NOT allowed (sums must stay exact) — instead the last round
        # simply also delivers dp samples (spp rounds up to a dp multiple).
        out.sum += rad.reshape(height, width, 3)
        out.count += dp
    return out
