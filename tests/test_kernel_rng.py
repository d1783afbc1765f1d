"""In-kernel counter RNG (ops/kernel_rng.py) + the krng regen megakernel.

The krng regen path draws bounce uniforms INSIDE the kernel from
(lane_id, sample, depth, seed) — a different stream from the scan
wavefront's threefry by construction, so estimator agreement is gated
statistically (SURVEY.md section 6b.4), while within the scheme draws are
bit-reproducible and invariant to lane sorting and pass grouping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_passes_fused
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import kernel_rng as kr
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


# --- generator quality -----------------------------------------------------


def _draws(n=1 << 16, seed=3, sample=5, depth=2):
    lane = jnp.arange(n, dtype=jnp.uint32).reshape(1, n)
    k0, k1 = kr.key_words(rng.base_key(seed))
    seeds = kr.channel_seeds(k0, k1)
    sd = jnp.full((1, n), sample * 256 + depth, jnp.uint32)
    u, v, p = kr.event_uniforms_rows(lane, sd, seeds)
    return np.asarray(u), np.asarray(v), np.asarray(p)


def test_uniform_range_and_moments():
    u, v, p = _draws()
    for x in (u, v, p):
        assert x.min() >= 0.0 and x.max() < 1.0
        # mean 0.5 +- 5 sigma (sigma = sqrt(1/12/n)), var ~ 1/12
        n = x.size
        assert abs(x.mean() - 0.5) < 5 * np.sqrt(1 / 12 / n)
        assert abs(x.var() - 1 / 12) < 0.002


def test_uniform_equidistribution_chi2():
    """64-bin chi-square on each output channel: statistic within 5 sigma
    of the chi2(63) expectation."""
    for x in _draws():
        counts, _ = np.histogram(x, bins=64, range=(0.0, 1.0))
        expect = x.size / 64
        chi2 = ((counts - expect) ** 2 / expect).sum()
        assert abs(chi2 - 63) < 5 * np.sqrt(2 * 63), chi2


def test_no_lane_or_channel_correlation():
    u, v, p = _draws()
    # adjacent-lane correlation and cross-channel correlation ~ N(0, 1/sqrt(n))
    bound = 5 / np.sqrt(u.size)
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < bound
    assert abs(np.corrcoef(u, v)[0, 1]) < bound
    assert abs(np.corrcoef(v, p)[0, 1]) < bound


def test_distinct_counters_distinct_draws():
    u_s5, _, _ = _draws(n=1024, sample=5, depth=2)
    u_s6, _, _ = _draws(n=1024, sample=6, depth=2)
    u_d3, _, _ = _draws(n=1024, sample=5, depth=3)
    assert not np.allclose(u_s5, u_s6)
    assert not np.allclose(u_s5, u_d3)
    # different seeds decorrelate
    u_k, _, _ = _draws(n=1024, seed=11, sample=5, depth=2)
    assert not np.allclose(u_s5, u_k)


def test_cross_sample_depth_correlation():
    """Draws at adjacent (sample, depth) counters are uncorrelated — the
    property Monte-Carlo integration over bounces actually needs."""
    a, _, _ = _draws(sample=5, depth=2)
    b, _, _ = _draws(sample=5, depth=3)
    c, _, _ = _draws(sample=6, depth=2)
    bound = 5 / np.sqrt(a.size)
    assert abs(np.corrcoef(a, b)[0, 1]) < bound
    assert abs(np.corrcoef(a, c)[0, 1]) < bound


def test_acos01_accuracy():
    x = np.linspace(0.0, 1.0, 100001, dtype=np.float32)
    got = np.asarray(kr.acos01(jnp.asarray(x)))
    ref = np.arccos(x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-6  # f32 rounding + 2e-8 poly error


# --- krng regen vs the scan wavefront (statistical estimator gate) ---------


def _cornell(w=24, h=24, depth=5, seed=7):
    params = RenderParams(
        width=w, height=h, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=depth, seed=seed, intersector="pallas-interpret",
    )
    sb = SceneBuilder()
    camera = create_scene(sb, "cornell", params)
    scene = sb.build()
    n = w * h
    px = jnp.asarray(np.arange(n, dtype=np.int32) % w)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // w)
    return scene, camera, params, px, py


def test_krng_regen_statistically_matches_table_regen():
    """Same estimator, independent streams: frame means of the two modes
    agree within the Monte-Carlo error of the sample count."""
    scene, camera, params, px, py = _cornell()
    base = rng.base_key(params.seed)
    S = 8
    rad_k = np.asarray(trace_passes_fused(
        scene, camera, params.replace(rng_mode="kernel"),
        base, 0, 0, px, py, S)) / S
    rad_t = np.asarray(trace_passes_fused(
        scene, camera, params.replace(rng_mode="table"),
        base, 0, 0, px, py, S)) / S
    # frame-mean agreement: the difference of two independent estimates of
    # the same integral; bound by ~5x the empirical std-error of the mean
    se = np.sqrt((rad_k.var() + rad_t.var()) / rad_k.size)
    assert abs(rad_k.mean() - rad_t.mean()) < 5 * se, (
        rad_k.mean(), rad_t.mean(), se)


def test_krng_regen_deterministic_and_sort_invariant():
    scene, camera, params, px, py = _cornell(w=16, h=16)
    base = rng.base_key(params.seed)
    a = np.asarray(trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, 3))
    b = np.asarray(trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, 3))
    np.testing.assert_array_equal(a, b)
    key = jnp.asarray(np.arange(16 * 16 * 4, dtype=np.int32)[::-1] % 53)
    c, _ = trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, 3,
        sort_key=key, with_lane_counts=True)
    np.testing.assert_array_equal(a, np.asarray(c))


def test_krng_regen_pass_grouping_invariance():
    """A sample's value is a pure function of (lane, global sample index):
    rendering 4 samples as one S=4 dispatch or two S=2 dispatches gives the
    same image up to f32 accumulation order."""
    from pt_three_ways_tpu.models.render import render

    scene, camera, params, _, _ = _cornell(w=12, h=12)
    params = params.replace(samples_per_pixel=4)
    a = render(scene, camera, params.replace(passes_per_dispatch=4))
    b = render(scene, camera, params.replace(passes_per_dispatch=2))
    np.testing.assert_allclose(a.sum, b.sum, rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(a.count, b.count)


def test_krng_regen_supports_up_to_64_passes():
    """Two-word alive bitmask: ONE 40-sample dispatch (crossing the 32-bit
    word boundary into amask_hi) equals two 20-sample dispatches — draws
    are pure functions of (lane, global sample, depth), so only f32
    accumulation order may differ. Calls trace_passes_fused directly so
    the 40-pass dispatch is guaranteed (render()'s passes-per-dispatch
    grouping must not split it — see the clamp test below)."""
    scene, camera, params, px, py = _cornell(w=8, h=8)
    base = rng.base_key(params.seed)
    a = np.asarray(trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, 40))
    b = np.asarray(trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, 20)) + np.asarray(
        trace_passes_fused(scene, camera, params, base, 20, 0, px, py, 20))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_render_ppd_clamp_allows_64():
    """render()'s passes-per-dispatch clamp equals the kernel's capacity
    (S_COUNT_MAX=64): a ppd=40 request renders 40-sample dispatches and
    matches ppd=20 grouping (regression for the stale min(ppd, 32) clamp
    that silently split >32-pass hints, ADVICE round 3)."""
    from pt_three_ways_tpu.models.render import render
    from pt_three_ways_tpu.ops.pallas_megakernel import S_COUNT_MAX

    assert S_COUNT_MAX == 64
    scene, camera, params, _, _ = _cornell(w=8, h=8)
    params = params.replace(samples_per_pixel=40)
    a = render(scene, camera, params.replace(passes_per_dispatch=40))
    b = render(scene, camera, params.replace(passes_per_dispatch=20))
    np.testing.assert_allclose(a.sum, b.sum, rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(a.count, b.count)


def test_krng_regen_seed_changes_image():
    scene, camera, params, px, py = _cornell(w=12, h=12)
    a = np.asarray(trace_passes_fused(
        scene, camera, params, rng.base_key(1), 0, 0, px, py, 2))
    b = np.asarray(trace_passes_fused(
        scene, camera, params, rng.base_key(2), 0, 0, px, py, 2))
    assert not np.array_equal(a, b)
