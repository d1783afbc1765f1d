"""ObjLoader tests (reference: test/util/ObjLoaderTests.cpp), using the same
duck-typed fakes: a capture builder and a throwing opener."""

import io
import math

import numpy as np
import pytest

from pt_three_ways_tpu.models.materials import MaterialSpec
from pt_three_ways_tpu.utils.obj_loader import (
    ObjLoaderOpener,
    load_materials,
    load_obj_file,
)


class ThrowingOpener(ObjLoaderOpener):
    def open(self, filename):
        raise IOError(f"Unable to open {filename}")


class DictOpener(ObjLoaderOpener):
    def __init__(self, files):
        self.files = files

    def open(self, filename):
        return io.StringIO(self.files[filename])


class CaptureBuilder:
    """Records add_triangle calls (ObjLoaderTests.cpp:14-26)."""

    def __init__(self):
        self.triangles = []
        self.spheres = []
        self.env = None

    def add_triangle(self, v0, v1, v2, mat):
        self.triangles.append((np.asarray(v0), np.asarray(v1), np.asarray(v2), mat))

    def add_sphere(self, centre, radius, mat):
        self.spheres.append((centre, radius, mat))

    def set_environment_colour(self, c):
        self.env = c


def load(text, opener=None):
    cb = CaptureBuilder()
    load_obj_file(io.StringIO(text), opener or ThrowingOpener(), cb)
    return cb


class TestObj:
    def test_empty_and_comments_and_crlf(self):
        cb = load("# comment\r\n\r\n   \n# another\n")
        assert cb.triangles == []

    def test_simple_face(self):
        cb = load("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        assert len(cb.triangles) == 1
        np.testing.assert_allclose(cb.triangles[0][1], [1, 0, 0])

    def test_trailing_comment_on_line(self):
        cb = load("v 0 0 0 # vertex zero\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        assert len(cb.triangles) == 1

    def test_negative_relative_indices(self):
        cb = load("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        assert len(cb.triangles) == 1
        np.testing.assert_allclose(cb.triangles[0][2], [0, 1, 0])

    def test_slash_face_tokens_parse_leading_index(self):
        # "f v/vt/vn" and "f v//vn" forms: std::stol semantics — parse the
        # leading integer, ignore the rest (ObjLoader.cpp:14-17).
        cb = load("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/4/7 2//5 3/6\n")
        assert len(cb.triangles) == 1
        np.testing.assert_allclose(cb.triangles[0][1], [1, 0, 0])
        np.testing.assert_allclose(cb.triangles[0][2], [0, 1, 0])

    def test_fan_decimation(self):
        cb = load("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        assert len(cb.triangles) == 2
        # fan: (v0,v1,v2), (v0,v2,v3)
        np.testing.assert_allclose(cb.triangles[1][1], [1, 1, 0])

    def test_unknown_directive_reports_line(self):
        with pytest.raises(ValueError, match="Unknown directive 'vq' on line 2"):
            load("v 0 0 0\nvq 1 2 3\n")

    def test_wrong_vertex_params(self):
        with pytest.raises(ValueError, match="Wrong number of params for v"):
            load("v 1 2\n")

    def test_usemtl_unknown_material(self):
        with pytest.raises(ValueError, match="Can't find material nope"):
            load("usemtl nope\n")

    def test_mtllib_via_opener(self):
        opener = DictOpener(
            {"mats.mtl": "newmtl red\nKd 0.8 0.1 0.1\nKe 1 2 3\n"}
        )
        cb = load(
            "mtllib mats.mtl\nusemtl red\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
            opener,
        )
        mat = cb.triangles[0][3]
        assert mat.diffuse == (0.8, 0.1, 0.1)
        assert mat.emission == (1.0, 2.0, 3.0)

    def test_mtllib_open_failure_propagates(self):
        with pytest.raises(IOError, match="Unable to open"):
            load("mtllib missing.mtl\n")

    def test_ignored_directives(self):
        cb = load("g group\no object\ns 1\n")
        assert cb.triangles == []


class TestMtl:
    def test_full_material(self):
        mats = load_materials(
            io.StringIO(
                "newmtl shiny\nKd 0.1 0.2 0.3\nKe 0.5 0.6 0.7\nNi 1.5\nNs 50\n"
            )
        )
        m = mats["shiny"]
        assert m.diffuse == (0.1, 0.2, 0.3)
        assert m.emission == (0.5, 0.6, 0.7)
        assert m.index_of_refraction == 1.5
        # Ns -> cone angle: pi * clamp(1 - Ns/100) (ObjLoader.cpp:91-97)
        assert m.reflection_cone_angle_radians == pytest.approx(math.pi * 0.5)

    def test_ns_clamped(self):
        mats = load_materials(io.StringIO("newmtl a\nNs 1000\n"))
        assert mats["a"].reflection_cone_angle_radians == 0.0

    def test_illum3_sets_reflectivity_from_ka(self):
        mats = load_materials(
            io.StringIO("newmtl m\nKa 0.6 0 0.8\nillum 3\n")
        )
        assert mats["m"].reflectivity == pytest.approx(1.0)

    def test_illum2_keeps_fresnel_sentinel(self):
        mats = load_materials(io.StringIO("newmtl m\nKa 1 1 1\nillum 2\n"))
        assert mats["m"].reflectivity == -1.0

    def test_ks_d_ignored(self):
        mats = load_materials(io.StringIO("newmtl m\nKs 1 1 1\nd 0.5\n"))
        assert "m" in mats

    def test_unknown_directive(self):
        with pytest.raises(ValueError, match="Unknown directive"):
            load_materials(io.StringIO("newmtl m\nBogus 1\n"))

    def test_directive_before_newmtl(self):
        with pytest.raises(ValueError, match="Unexpected"):
            load_materials(io.StringIO("Kd 1 1 1\n"))

    def test_multiple_materials(self):
        mats = load_materials(
            io.StringIO("newmtl a\nKd 1 0 0\nnewmtl b\nKd 0 1 0\n")
        )
        assert mats["a"].diffuse == (1.0, 0.0, 0.0)
        assert mats["b"].diffuse == (0.0, 1.0, 0.0)
