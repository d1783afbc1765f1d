"""Native library (csrc/pt3native.cpp) tests: equivalence with the Python
OBJ/MTL loader, Morton ordering, and raw merge."""

import os

import jax

import numpy as np
import pytest

from pt_three_ways_tpu.utils import native
from pt_three_ways_tpu.utils.assets import scenes_dir
from pt_three_ways_tpu.utils.framebuffer import ArrayOutput, merge
from pt_three_ways_tpu.utils.obj_loader import DirRelativeOpener, load_obj_file

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)


class Capture:
    def __init__(self):
        self.tris = []
        self.mats = []

    def add_triangle(self, v0, v1, v2, mat):
        self.tris.append(np.array([v0, v1, v2]))
        self.mats.append(mat)

    def add_sphere(self, *a):
        pass

    def set_environment_colour(self, *a):
        pass


@pytest.mark.parametrize("name", ["CornellBox-Original.obj", "suzanne.obj"])
def test_native_obj_matches_python(name):
    d = scenes_dir()
    out = native.parse_obj_native(os.path.join(d, name), d)
    assert out is not None
    verts, mat_ids, mats = out

    cap = Capture()
    opener = DirRelativeOpener(d)
    with opener.open(name) as f:
        load_obj_file(f, opener, cap)

    assert verts.shape[0] == len(cap.tris)
    np.testing.assert_allclose(verts, np.stack(cap.tris), rtol=0, atol=0)
    # material values per triangle must agree
    for i in range(0, len(cap.tris), max(1, len(cap.tris) // 17)):
        spec = cap.mats[i]
        row = mats[mat_ids[i]]
        np.testing.assert_allclose(row[0:3], spec.emission)
        np.testing.assert_allclose(row[3:6], spec.diffuse)
        assert row[6] == pytest.approx(spec.index_of_refraction)
        assert row[7] == pytest.approx(spec.reflectivity)
        assert row[8] == pytest.approx(spec.reflection_cone_angle_radians)


def test_native_obj_error(tmp_path):
    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nvq 1 2\n")
    with pytest.raises(ValueError, match="Unknown directive 'vq' on line 2"):
        native.parse_obj_native(str(bad), str(tmp_path))


def test_morton_order_native_matches_python(rng_np):
    pts = rng_np.normal(size=(257, 3))
    a = native.morton_order(pts)
    os.environ["PT3_NO_NATIVE"] = "1"
    try:
        native._LIB = None
        native._TRIED = False
        b = native.morton_order(pts)
    finally:
        del os.environ["PT3_NO_NATIVE"]
        native._LIB = None
        native._TRIED = False
    np.testing.assert_array_equal(a, b)
    assert sorted(a.tolist()) == list(range(257))


def test_morton_order_is_spatially_coherent(rng_np):
    # points on a line must come out in line order
    t = np.linspace(0, 1, 64)
    pts = np.stack([t, t, t], axis=1)
    order = native.morton_order(pts)
    assert (np.diff(order) > 0).all()


def test_native_raw_merge_matches_python(tmp_path, rng_np):
    paths = []
    outs = []
    for i in range(3):
        a = ArrayOutput(6, 4)
        a.sum[:] = rng_np.normal(size=(4, 6, 3))
        a.count[:] = rng_np.integers(0, 50, size=(4, 6))
        p = str(tmp_path / f"{i}.raw")
        a.save(p)
        paths.append(p)
        outs.append(a)
    out_native = str(tmp_path / "merged_native.raw")
    assert native.raw_merge_native(paths, out_native)
    got = ArrayOutput.load(out_native)
    want = merge(outs)
    np.testing.assert_array_equal(got.sum, want.sum)
    np.testing.assert_array_equal(got.count, want.count)


def test_native_raw_merge_size_mismatch(tmp_path):
    a = ArrayOutput(2, 2)
    b = ArrayOutput(3, 2)
    pa, pb = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    a.save(pa)
    b.save(pb)
    with pytest.raises(IOError, match="differently-sized"):
        native.raw_merge_native([pa, pb], str(tmp_path / "o.raw"))


@pytest.mark.parametrize("scene_name", ["cornell", "suzanne", "ce"])
def test_catalog_native_obj_path_builds_identical_scene(scene_name, monkeypatch):
    """The wired native ingest (catalog._load_obj -> add_triangles_soa)
    produces a bit-identical built scene to the Python loader path."""
    import jax.numpy as jnp

    from pt_three_ways_tpu.models.catalog import create_scene
    from pt_three_ways_tpu.models.scene import SceneBuilder
    from pt_three_ways_tpu.utils.render_params import RenderParams

    if native.load() is None:
        pytest.skip("native library unavailable")
    params = RenderParams(width=16, height=16)

    def build(flag):
        monkeypatch.setenv("PT3_NATIVE_OBJ", flag)
        sb = SceneBuilder()
        create_scene(sb, scene_name, params)
        return sb.build()

    a = build("1")
    b = build("0")
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
