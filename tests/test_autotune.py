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
