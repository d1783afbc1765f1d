"""Counter-based stateless RNG.

The reference threads a mutable mt19937 per worker (seeded seed+passIndex,
src/oo/Renderer.cpp:99) — inherently sequential and irreproducible under
resharding. We replace it with JAX's counter-based threefry: every random
draw is a pure function of (seed, pass, bounce, purpose, array index), so

  * the same seed gives bit-identical images regardless of device count or
    dispatch tiling (each tile/device folds in its own global offset);
  * the backward path-replay pass can regenerate the forward decisions
    exactly without storing them.

Cross-framework image equality with the C++ is statistical, never bitwise
(SURVEY.md section 6b.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream labels so distinct uses of the same (seed, pass) never collide.
CAMERA_STREAM = 0x0C0FFEE
FIRST_BOUNCE_STREAM = 0x1B0B0
BOUNCE_STREAM_BASE = 0x2000000
# Seed stream for the IN-KERNEL counter RNG (ops/kernel_rng.py): folded from
# the base key only (no pass/tile folds — the kernel's counters carry those),
# so its draws are invariant to dispatch tiling and sharding.
KERNEL_RNG_STREAM = 0x6B524E47  # "kRNG"


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def pass_key(key: jax.Array, pass_index) -> jax.Array:
    """Per-sample-pass key (analogue of mt19937(seed + pass))."""
    return jax.random.fold_in(key, pass_index)


def stream_key(key: jax.Array, stream: int) -> jax.Array:
    return jax.random.fold_in(key, stream)


def tile_key(key: jax.Array, tile_index) -> jax.Array:
    """Per-dispatch-tile / per-device fold so shards draw disjoint streams."""
    return jax.random.fold_in(key, tile_index)


def uniforms(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """U[0,1) of the given shape; counter-based over the flat index."""
    return jax.random.uniform(key, shape, dtype=dtype)
