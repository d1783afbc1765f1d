"""Fused bounce megakernel (interpret mode) vs the unfused wavefront.

Both consume identical RNG streams, so per-pixel radiance must agree to f32
rounding (the fused path reorders FMAs and gathers attributes via bf16x3
one-hot matmuls, which are exact)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_pass
from pt_three_ways_tpu.models.materials import MaterialSpec
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.ops.camera import make_camera
from pt_three_ways_tpu.utils.render_params import RenderParams


def sphere_scene():
    sb = SceneBuilder()
    sb.add_sphere((0, 0, 5), 1.5, MaterialSpec.make_diffuse((0.6, 0.4, 0.3)))
    sb.add_sphere((1.5, 1.5, 4), 0.8, MaterialSpec.make_light((4, 4, 4)))
    sb.add_sphere((-1.2, -0.5, 4.5), 0.6,
                  MaterialSpec.make_reflective((0.9, 0.9, 0.9), 0.7, 10))
    sb.set_environment_colour((0.1, 0.12, 0.1))
    return sb


def mesh_scene():
    """Triangles + spheres: cornell (38 tris, 1 sphere, glossy + light)."""
    sb = SceneBuilder()
    params = RenderParams(width=16, height=16)
    camera = create_scene(sb, "cornell", params)
    return sb, camera


def run_both(sb, camera, width=16, height=16, spp_key=3, depth=4):
    params = RenderParams(
        width=width, height=height, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=depth, seed=spp_key,
        intersector="pallas-interpret",
    )
    scene = sb.build()
    n = width * height
    px = jnp.asarray(np.arange(n, dtype=np.int32) % width)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // width)
    key = rng.pass_key(rng.base_key(params.seed), 0)
    fused = trace_pass(scene, camera, params, key, px, py)
    unfused = trace_pass(
        scene, camera, params.replace(fused="off"), key, px, py
    )
    return np.asarray(fused), np.asarray(unfused)


def test_megakernel_matches_wavefront_spheres():
    sb = sphere_scene()
    camera = make_camera((0, 0, 0), (0, 0, 5), (0, 1, 0), 16, 16, 60.0)
    fused, unfused = run_both(sb, camera)
    np.testing.assert_allclose(fused, unfused, rtol=2e-4, atol=2e-4)


def test_megakernel_matches_wavefront_cornell():
    sb, camera = mesh_scene()
    fused, unfused = run_both(sb, camera)
    np.testing.assert_allclose(fused, unfused, rtol=2e-4, atol=2e-4)


def test_megakernel_ray_counts_match():
    sb, camera = mesh_scene()
    params = RenderParams(
        width=16, height=16, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=5, intersector="pallas-interpret",
    )
    scene = sb.build()
    n = 16 * 16
    px = jnp.asarray(np.arange(n, dtype=np.int32) % 16)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // 16)
    key = rng.pass_key(rng.base_key(params.seed), 0)
    _, n_fused = trace_pass(scene, camera, params, px=px, py=py, key=key,
                            with_ray_count=True)
    _, n_unfused = trace_pass(scene, camera, params.replace(fused="off"),
                              px=px, py=py, key=key, with_ray_count=True)
    assert int(n_fused) == int(n_unfused)


def test_regen_fused_passes_match_pass_sum():
    """The regenerating multi-pass megakernel in TABLE RNG mode equals the
    sum of single passes over the same key chain (fold(fold(base, s),
    tile)). rng_mode="table" is the bit-compat bridge to the scan path; the
    in-kernel RNG mode draws different (statistically gated) streams —
    tests/test_kernel_rng.py."""
    import jax

    from pt_three_ways_tpu.models.integrator import trace_passes_fused

    sb, camera = mesh_scene()
    params = RenderParams(
        width=16, height=16, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=7, intersector="pallas-interpret",
        rng_mode="table",
    )
    scene = sb.build()
    n = 16 * 16
    px = jnp.asarray(np.arange(n, dtype=np.int32) % 16)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // 16)
    base = rng.base_key(params.seed)

    S = 3
    fused, n_f = trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, S, with_ray_count=True
    )
    expect = np.zeros((n, 3), np.float64)
    n_u = 0
    for s in range(S):
        key = jax.random.fold_in(jax.random.fold_in(base, s), 0)
        rad, nr = trace_pass(scene, camera, params, key, px, py,
                             with_ray_count=True)
        expect += np.asarray(rad, np.float64)
        n_u += int(nr)
    np.testing.assert_allclose(np.asarray(fused), expect, rtol=3e-4, atol=3e-4)
    assert int(n_f) == n_u


def test_render_loop_feedback_chain_is_bit_exact():
    """End-to-end render() with regen_feedback_sort chains per-tile counts
    across dispatch groups (zeros key on the first, accumulated after);
    output must be bit-identical to the unsorted render."""
    from pt_three_ways_tpu.models.render import render

    sb, camera_ = mesh_scene()
    scene = sb.build()

    def go(sort):
        params = RenderParams(
            width=16, height=16, samples_per_pixel=4,
            first_bounce_u_samples=2, first_bounce_v_samples=2,
            max_depth=3, seed=5, intersector="pallas-interpret",
            passes_per_dispatch=2, regen_feedback_sort=sort,
        )
        return render(scene, camera_, params)

    a, b = go(False), go(True)
    np.testing.assert_array_equal(a.sum, b.sum)
    np.testing.assert_array_equal(a.count, b.count)


def test_regen_feedback_sort_is_bit_exact():
    """The feedback work-sort permutation must not change a single bit of
    the estimator: per-lane kernel output is tile-independent, and outputs
    are unsorted before returning."""
    import jax

    from pt_three_ways_tpu.models.integrator import trace_passes_fused

    sb, camera = mesh_scene()
    params = RenderParams(
        width=16, height=16, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=7, intersector="pallas-interpret",
    )
    scene = sb.build()
    n = 16 * 16
    px = jnp.asarray(np.arange(n, dtype=np.int32) % 16)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // 16)
    base = rng.base_key(params.seed)

    plain, n_p, cnt_p = trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, 3,
        with_ray_count=True, with_lane_counts=True,
    )
    # an adversarial key: reverse-ish ordering scattered across tiles
    key = jnp.asarray(np.arange(n * 4, dtype=np.int32)[::-1] % 97)
    sorted_, n_s, cnt_s = trace_passes_fused(
        scene, camera, params, base, 0, 0, px, py, 3,
        with_ray_count=True, with_lane_counts=True, sort_key=key,
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sorted_))
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_s))
    assert int(n_p) == int(n_s)


def test_regen_fused_handles_all_dead_lanes():
    """Pixels whose camera rays miss everything exhaust immediately; the
    while-loop still terminates and radiance equals the environment."""
    from pt_three_ways_tpu.models.integrator import trace_passes_fused

    sb = SceneBuilder()
    sb.add_sphere((0, 0, 100), 1.0, MaterialSpec.make_diffuse((0.5, 0.5, 0.5)))
    sb.set_environment_colour((0.2, 0.3, 0.4))
    scene = sb.build()
    camera = make_camera((0, 0, 0), (0, 0, -10), (0, 1, 0), 8, 8, 40.0)
    params = RenderParams(
        width=8, height=8, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=2, intersector="pallas-interpret",
    )
    n = 64
    px = jnp.asarray(np.arange(n, dtype=np.int32) % 8)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // 8)
    out = np.asarray(trace_passes_fused(
        scene, camera, params, rng.base_key(2), 0, 0, px, py, 2
    ))
    np.testing.assert_allclose(out, np.tile([0.4, 0.6, 0.8], (n, 1)),
                               rtol=1e-6)


def test_compact_passes_match_pass_sum():
    """The compacting wavefront (argsort packing between bounces) equals the
    sum of single passes over the same key chain — compaction only permutes
    lane positions, so per-path arithmetic is identical."""
    import jax

    from pt_three_ways_tpu.models.integrator import trace_passes_compact

    sb, camera = mesh_scene()
    params = RenderParams(
        width=16, height=16, samples_per_pixel=1,
        first_bounce_u_samples=2, first_bounce_v_samples=2,
        max_depth=4, seed=7, intersector="pallas-interpret",
    )
    scene = sb.build()
    n = 16 * 16
    px = jnp.asarray(np.arange(n, dtype=np.int32) % 16)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // 16)
    base = rng.base_key(params.seed)

    S = 3
    fused, n_f = trace_passes_compact(
        scene, camera, params, base, 0, 0, px, py, S, with_ray_count=True
    )
    expect = np.zeros((n, 3), np.float64)
    n_u = 0
    for s in range(S):
        key = jax.random.fold_in(jax.random.fold_in(base, s), 0)
        rad, nr = trace_pass(scene, camera, params, key, px, py,
                             with_ray_count=True)
        expect += np.asarray(rad, np.float64)
        n_u += int(nr)
    np.testing.assert_allclose(np.asarray(fused), expect, rtol=3e-4, atol=3e-4)
    assert int(n_f) == n_u
