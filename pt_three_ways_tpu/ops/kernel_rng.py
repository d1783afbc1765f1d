"""Counter-based RNG computable INSIDE Pallas TPU kernels.

The regenerating megakernel (ops/pallas_megakernel.py) originally consumed
uniforms precomputed into HBM state tables ([4*S*nb, N] f32 per dispatch) and
selected per-lane values with an O(S*nb) masked-select loop every while-loop
iteration — both the VMEM ceiling on the pass-fusion factor S and a
per-iteration vector-op tax larger than the shading tail itself. This module
replaces the tables with a counter-based generator evaluated on the VPU at
the point of use: every uniform is a pure function of

    (lane_id, sample_index, bounce_depth, seed)

so draws are bit-reproducible for a fixed seed regardless of dispatch
tiling, lane sorting (the feedback work-sort permutes lanes freely) or
device sharding — a stronger determinism contract than the table path,
whose streams fold the dispatch tile index (ops/rng.py).

Generator: per-channel seeded murmur3 finalizers (fmix32) over the counter
word ``lane * P1 + sd * P2`` — the "seeded hash per decision" pattern of
production GPU path tracers (cf. Jarzynski & Olano, "Hash Functions for GPU
Rendering", JCGT 2020). The three output channels are stacked as ROWS of a
[3, N] block so the whole hash is elementwise — a 1-D [N] vector occupies
one sublane of eight on the VPU, so row-stacking cuts the op count ~5x
(measured: the 4-channel scalar-form pcg4d cost cornell 13% of its pass
time; this form ~3%). Statistical quality gates: uniformity/chi-square/
correlation tests in tests/test_kernel_rng.py, image agreement vs the scan
wavefront, and the refgate oracle vs the compiled C++ reference. Images
are gated statistically, never bitwise (SURVEY.md section 6b.4; the
reference seeds mt19937 per pass, src/oo/Renderer.cpp:99).

Everything here is plain jnp on arrays so the SAME functions run inside
Pallas kernels (Mosaic lowers uint32 mul/xor/shift and the f32 bitcast) and
in XLA for oracle tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def uniform_from_bits(bits):
    """uint32 -> f32 uniform in [0, 1): top 23 bits into a [1,2) mantissa."""
    f = jax.lax.bitcast_convert_type(
        (bits >> _U32(9)) | _U32(0x3F800000), jnp.float32
    )
    return f - 1.0


# Abramowitz & Stegun 4.4.45 extended: acos(x) = sqrt(1-x) * P7(x) on [0,1],
# |err| <= 2e-8 rad — below f32 resolution of the downstream cone angle.
_ACOS_C = (
    1.5707963050,
    -0.2145988016,
    0.0889789874,
    -0.0501743046,
    0.0308918810,
    -0.0170881256,
    0.0066700901,
    -0.0012624911,
)


def acos01(x):
    """acos for x in [0, 1] (uniform-sample domain), f32-accurate.

    Mosaic has no acos primitive; the table path precomputed acos outside
    the kernel (pallas_megakernel unif rows). This polynomial runs on the
    VPU instead.
    """
    p = jnp.float32(_ACOS_C[7])
    for coef in _ACOS_C[6::-1]:
        p = p * x + jnp.float32(coef)
    return jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * p


# fmix32: the murmur3 finalizer — full-avalanche bijective mixer.
# numpy scalars, NOT jnp arrays: a module-level jnp constant would be
# captured by Pallas kernel traces ("captures constants" error).
_FMIX_C1 = np.uint32(0x85EBCA6B)
_FMIX_C2 = np.uint32(0xC2B2AE35)
# large odd input-combination primes (distinct from the fmix constants)
_IN_P1 = np.uint32(0x9E3779B1)  # golden-ratio prime
_IN_P2 = np.uint32(0x85EBCA77)


def fmix32(h):
    h = h ^ (h >> _U32(16))
    h = h * _FMIX_C1
    h = h ^ (h >> _U32(13))
    h = h * _FMIX_C2
    h = h ^ (h >> _U32(16))
    return h


def event_uniforms_rows(lane_row, sd_row, seeds):
    """(u, v, p) via per-channel seeded hashes, computed as a [3, N] block.

    Mosaic lays a 1-D [N] vector out as (1, N) — one sublane of eight — so
    every pcg4d op in event_uniforms runs at 1/8 VPU utilisation (measured:
    ~0.5 us/iteration on cornell, 13% of its pass time). Stacking the three
    output channels as ROWS makes the whole hash elementwise on [3, N]
    (channels never cross-mix; each row is fmix32 of the same (lane, sd)
    combination under a different seed), cutting the op count ~5x. Channel
    decorrelation comes from fmix32's avalanche on the distinct seeds;
    statistical gates: tests/test_kernel_rng.py.

    lane_row/sd_row: [1, N] uint32; seeds: [3, 1] uint32 (per-channel).
    Returns u, v, p as [N] vectors.
    """
    h = lane_row * _IN_P1 + sd_row * _IN_P2 + seeds  # [3, N]
    r = uniform_from_bits(fmix32(h))
    return r[0, :], r[1, :], r[2, :]


def event_uniforms_premixed(base_row, seeds):
    """(u, v, p) from a PREMIXED counter row: ``base_row`` must equal
    ``lane_row * _IN_P1 + sd_row * _IN_P2`` (uint32). Bit-identical to
    event_uniforms_rows; lets the krng kernel hoist the loop-invariant
    lane term and keep the sd term incremental (uint32 multiplies are the
    expensive VPU ops in the hash — adds are nearly free).
    """
    r = uniform_from_bits(fmix32(base_row + seeds))
    return r[0, :], r[1, :], r[2, :]


def channel_seeds(k0, k1):
    """Three per-channel seed words from the dispatch key (host side)."""
    base = jnp.stack([k0, k1 ^ _U32(0x243F6A88), k0 + _U32(0xB7E15163)])
    return fmix32(base.astype(_U32) + k1.astype(_U32) * _IN_P1).reshape(3, 1)


def key_words(key: jax.Array):
    """The two uint32 words of a JAX threefry key (kernel seed inputs).

    Accepts both typed key arrays and raw uint32[2] keys."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    data = key.astype(_U32)
    return data[0], data[1]
