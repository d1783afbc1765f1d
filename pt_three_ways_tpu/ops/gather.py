"""Table lookups as one-hot matmuls.

TPU gathers with large index vectors are pathologically slow (measured
~8 ms per [1M]-from-[small-table] gather on v5e, ~160 ms for 21 of them),
while a one-hot [T, R] operand feeding a [C, T] @ [T, R] matmul runs on the
MXU in ~2 ms. Every per-ray winner/material lookup in the framework goes
through this helper.

The one-hot product is EXACT (each output lane sums exactly one table
entry), so results are bit-identical to a gather. Large tables are processed
in chunks of ``chunk`` with a masked accumulate so the one-hot operand stays
bounded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot_gather(coef: jnp.ndarray, idx: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """coef: [C, T]; idx: [R] int -> [C, R] == coef[:, idx], via MXU.

    Exact (one nonzero per output lane). idx values outside [0, T) produce 0.
    """
    c, t = coef.shape
    (r,) = idx.shape
    dtype = coef.dtype
    if t == 0:
        return jnp.zeros((c, r), dtype)
    # Precision note: bf16x3 (HIGH) decomposes each f32 operand exactly into
    # three bf16 terms, and the one-hot side is exactly representable, so the
    # selection is EXACT while running ~6x faster than the full f32 emulation
    # (HIGHEST). Plain DEFAULT would round coefficients to bf16 — wrong.
    precision = jax.lax.Precision.HIGH
    if t <= chunk:
        oh = (idx[None, :] == jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)).astype(
            dtype
        )
        return jax.lax.dot(coef, oh, precision=precision)

    pad = (-t) % chunk
    if pad:
        coef = jnp.concatenate([coef, jnp.zeros((c, pad), dtype)], axis=1)
    n_chunks = coef.shape[1] // chunk
    chunks = coef.reshape(c, n_chunks, chunk).transpose(1, 0, 2)  # [N, C, chunk]
    lo = idx % chunk
    hi = idx // chunk
    oh_lo = (lo[None, :] == jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)).astype(
        dtype
    )  # [chunk, R]

    def body(carry, inputs):
        h, coef_h = inputs
        mask = (hi == h).astype(dtype)[None, :]
        part = jax.lax.dot(coef_h, oh_lo * mask, precision=precision)
        return carry + part, None

    init = jnp.zeros((c, r), dtype)
    out, _ = jax.lax.scan(body, init, (jnp.arange(n_chunks), chunks))
    return out


def onehot_gather_int(
    coef: jnp.ndarray, idx: jnp.ndarray, chunk: int = 2048
) -> jnp.ndarray:
    """Integer table lookup via the f32 one-hot path (exact below 2^24)."""
    out = onehot_gather(coef.astype(jnp.float32)[None, :], idx, chunk)[0]
    return jnp.round(out).astype(coef.dtype)
