"""Scene-SIZE scaling: -subN subdivided scenes, the VMEM table budget and
the tiered intersector fallback (megakernel -> Pallas intersect scan -> XLA
chunked scan). The reference's linear scan is unbounded in N
(src/dod/Scene.cpp:51-113); these tests pin that no scene size hard-fails
here either — only the backend selection changes.
"""

import jax
import numpy as np
import pytest

from pt_three_ways_tpu.models.catalog import _subdivide_soa, create_scene
from pt_three_ways_tpu.models.integrator import resolve_intersector
from pt_three_ways_tpu.models.render import render, uses_regen
from pt_three_ways_tpu.models.scene import SceneBuilder
from pt_three_ways_tpu.ops import pallas_megakernel as mk
from pt_three_ways_tpu.utils.render_params import RenderParams


def _build(name, params):
    sb = SceneBuilder()
    cam = create_scene(sb, name, params)
    return sb.build(), cam


def test_subdivision_multiplies_triangles_only():
    p = RenderParams(width=8, height=8, samples_per_pixel=1, seed=1)
    base, _ = _build("suzanne", p)
    sub, _ = _build("suzanne-sub2", p)
    assert sub.triangles.woop.shape[0] == 16 * base.triangles.woop.shape[0]
    assert sub.spheres.centre.shape[0] == base.spheres.centre.shape[0]


def test_subdivision_children_tile_parent_exactly():
    rng = np.random.default_rng(3)
    verts = rng.normal(size=(5, 3, 3))
    sub, mids = _subdivide_soa(verts, np.arange(5, dtype=np.int32), 1)
    assert sub.shape == (20, 3, 3)
    assert (mids == np.repeat(np.arange(5), 4)).all()
    # children partition the parent: areas sum, centroid preserved
    def areas(v):
        return 0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1
        )
    a_parent = areas(verts)
    a_child = areas(sub).reshape(5, 4)
    np.testing.assert_allclose(a_child.sum(axis=1), a_parent, rtol=1e-12)
    np.testing.assert_allclose(
        sub.reshape(5, 4, 3, 3).mean(axis=(1, 2)), verts.mean(axis=1),
        rtol=1e-12,
    )


def test_subdivided_render_matches_base():
    """Same planes + same RNG -> the subdivided scene renders the SAME
    image (the -subN axis scales intersector cost, not the estimator)."""
    p = RenderParams(width=16, height=16, samples_per_pixel=2, seed=5)
    base_scene, base_cam = _build("suzanne", p)
    sub_scene, sub_cam = _build("suzanne-sub1", p)
    o0 = render(base_scene, base_cam, p).mean()
    o1 = render(sub_scene, sub_cam, p).mean()
    np.testing.assert_allclose(o0, o1, atol=1e-5)


def test_unknown_sub_suffix_still_rejected():
    p = RenderParams(width=8, height=8, samples_per_pixel=1, seed=1)
    with pytest.raises(ValueError, match="Unknown scene"):
        _build("nope-sub2", p)
    with pytest.raises(ValueError, match="Unknown scene"):
        _build("suzanne-subx", p)


def test_scene_table_bytes_matches_packed_tables():
    """The budget estimator must mirror the real packed-table shapes under
    the native VMEM tiling (lane dim pads to 128 — a [T, 12] f32 table
    costs 512 B/row in VMEM, the constraint the Mosaic OOM reports)."""
    p = RenderParams(width=8, height=8, samples_per_pixel=1, seed=1)

    def tiled(shape, itemsize=4):
        return mk._tiled_bytes(shape[0], shape[1], itemsize)

    for name in ("cornell", "suzanne", "single-sphere"):
        scene, _ = _build(name, p)
        packed = mk.PackedSceneFused(scene)
        actual_isect = (
            tiled(packed.tri_tab.shape)
            + tiled(packed.box_tab.shape)
            + tiled(packed.box1_tab.shape)
            + tiled(packed.sph_tab.shape)
        )
        actual_fused = actual_isect + sum(
            tiled(t.shape, 2) for t in packed.tri_coef + packed.sph_coef
        )
        n_tri, n_sph = packed.n_tri, packed.n_sph
        assert mk.scene_table_bytes(n_tri, n_sph, fused=False) == actual_isect
        assert mk.scene_table_bytes(n_tri, n_sph, fused=True) == actual_fused


def test_vmem_model_matches_mosaic_oom_reports():
    """Pin the estimator against two REAL Mosaic scoped-vmem OOM reports
    captured on v5e (round 3): the intersect kernel's scene tables at
    suzanne-sub3/sub4 requested 30.86M / 121.50M against the 16.00M limit.
    The table-bytes estimate must reproduce those figures to within the
    non-table remainder (ray blocks + scratch, < 2 MiB)."""
    est3 = mk.scene_table_bytes(62080, 3, fused=False)
    est4 = mk.scene_table_bytes(248320, 3, fused=False)
    assert abs(est3 - 30.86 * 2**20) < 2 * 2**20
    assert abs(est4 - 121.50 * 2**20) < 4 * 2**20


def test_vmem_budget_tiers_select_backend(monkeypatch):
    p = RenderParams(
        width=8, height=8, samples_per_pixel=1, seed=1, intersector="pallas"
    )
    scene, _ = _build("suzanne", p)
    fused_b = mk.scene_table_bytes(
        scene.triangles.woop.shape[0], scene.spheres.centre.shape[0], True
    )
    isect_b = mk.scene_table_bytes(
        scene.triangles.woop.shape[0], scene.spheres.centre.shape[0], False
    )
    from pt_three_ways_tpu.models.integrator import uses_stream

    # roomy budget: resident megakernel tier
    monkeypatch.setattr(mk, "SCENE_VMEM_BUDGET_BYTES", fused_b + 1)
    assert resolve_intersector(p, scene) == "pallas"
    assert uses_regen(p, "dod", scene)
    assert not uses_stream(p, scene)
    # over the fused-table ceiling: since round 4 the regen megakernel
    # STREAMS triangles from HBM (kernel-RNG scenes); the camera stage
    # keeps the Pallas intersect kernel while its tables fit
    monkeypatch.setattr(mk, "SCENE_VMEM_BUDGET_BYTES", fused_b - 1)
    assert resolve_intersector(p, scene) == "pallas"
    assert uses_stream(p, scene)
    assert uses_regen(p, "dod", scene)
    # table-RNG mode cannot stream (the uniform tables ARE the budget
    # problem): old tiering — Pallas intersect scan, no megakernel
    pt = p.replace(rng_mode="table")
    assert not uses_stream(pt, scene)
    assert not uses_regen(pt, "dod", scene)
    # below even the intersect tables: camera stage falls to the XLA
    # chunked scan; the streamed megakernel still runs the bounces
    monkeypatch.setattr(mk, "SCENE_VMEM_BUDGET_BYTES", isect_b - 1)
    assert resolve_intersector(p, scene) == "xla"
    assert uses_stream(p, scene)
    assert uses_regen(p, "dod", scene)
    assert not uses_regen(pt, "dod", scene)
    # interpret mode never falls back (no VMEM)
    pi = p.replace(intersector="pallas-interpret")
    assert resolve_intersector(pi, scene) == "pallas-interpret"


def test_over_budget_scene_renders_via_fallback(monkeypatch):
    """End to end: an 'over-budget' scene must still render (through the
    XLA scan) and agree with the in-budget render bit-for-bit — fallback
    changes scheduling, never the estimator."""
    p = RenderParams(width=8, height=8, samples_per_pixel=1, seed=2)
    scene, cam = _build("cornell", p)
    ref = render(scene, cam, p).mean()
    monkeypatch.setattr(mk, "SCENE_VMEM_BUDGET_BYTES", 1)
    out = render(scene, cam, p).mean()
    np.testing.assert_array_equal(ref, out)
