"""Runtime auto-tuning (models/render.autotune_decisions): the first
dispatch's per-lane bounce counts must reproduce the MEASURED per-scene
hint rows (models/catalog.py) so unknown scenes get catalog-class tuning.

Counts come from the real regen kernel (interpret mode) at a small frame —
the depth/divergence statistics the heuristic reads are resolution-stable.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.models.integrator import trace_passes_fused
from pt_three_ways_tpu.models.render import autotune_decisions
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import rng
from pt_three_ways_tpu.utils.render_params import RenderParams


def _first_dispatch_counts(scene_name, w=32, s0=8):
    params = RenderParams(
        width=w, height=w, samples_per_pixel=s0, seed=1,
        intersector="pallas-interpret",
    )
    sb = SceneBuilder()
    camera = create_scene(sb, scene_name, params)
    scene = sb.build()
    n = w * w
    px = jnp.asarray(np.arange(n, dtype=np.int32) % w)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // w)
    _, cnts = trace_passes_fused(
        scene, camera, params, rng.base_key(1), 0, 0, px, py, s0,
        with_lane_counts=True,
    )
    return np.asarray(cnts), scene, params


def _decide(scene_name):
    cnts, scene, params = _first_dispatch_counts(scene_name)
    return autotune_decisions(
        cnts, 8, params.max_depth - 1,
        scene.num_triangles, scene.num_spheres,
    )


def test_cornell_closed_small_scene():
    d = _decide("cornell")
    assert d["rng_mode"] == "table"
    assert d["passes_per_dispatch"] == 8
    assert not d["feedback_sort"] and d["tail_frac"] == 0.0


def test_suzanne_divergent_open_scene():
    d = _decide("suzanne")
    assert d["rng_mode"] == "kernel"
    assert d["passes_per_dispatch"] == 64
    assert d["feedback_sort"] and d["tail_frac"] == 0.125


def test_ce_emissive_kill_scene():
    d = _decide("ce")
    assert d["rng_mode"] == "kernel"
    assert d["passes_per_dispatch"] == 64
    assert not d["feedback_sort"] and d["tail_frac"] == 0.0


def test_bbc_owl_divergent_scene():
    d = _decide("bbc-owl")
    assert d["rng_mode"] == "kernel"
    assert d["feedback_sort"] and d["tail_frac"] == 0.125


def test_heuristic_matches_catalog_hint_tables():
    """The hint tables are the TEST ORACLE for the heuristic (VERDICT r4
    #8): the CLI no longer consults them, so this is what keeps the
    measured optima and autotune_decisions from silently diverging when a
    kernel change shifts an optimum. Every scene with any hint row must
    be reproduced by the heuristic."""
    from pt_three_ways_tpu.models.catalog import (
        FEEDBACK_SORT_HINT,
        PASSES_PER_DISPATCH_HINT,
        REGEN_TAIL_FRAC_HINT,
        RNG_MODE_HINT,
    )

    hinted = (
        set(PASSES_PER_DISPATCH_HINT)
        | set(FEEDBACK_SORT_HINT)
        | set(REGEN_TAIL_FRAC_HINT)
        | set(RNG_MODE_HINT)
    )
    # streamed -subN scenes are too slow for interpret-mode probing here;
    # their sort hints mirror suzanne's divergent-open statistics, which
    # the suzanne row below covers
    hinted = {s for s in hinted if "-sub" not in s}
    assert hinted, "no hinted scenes found"
    for scene_name in sorted(hinted):
        d = _decide(scene_name)
        exp_rng = RNG_MODE_HINT.get(scene_name, "kernel")
        exp_ppd = PASSES_PER_DISPATCH_HINT.get(scene_name, None)
        exp_sort = FEEDBACK_SORT_HINT.get(scene_name, False)
        exp_tail = REGEN_TAIL_FRAC_HINT.get(scene_name, 0.0)
        assert d["rng_mode"] == exp_rng, scene_name
        if exp_ppd is not None:
            assert d["passes_per_dispatch"] == exp_ppd, scene_name
        assert d["feedback_sort"] == exp_sort, scene_name
        assert d["tail_frac"] == exp_tail, scene_name
