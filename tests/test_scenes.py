"""Scene catalog tests (reference: src/main/main.cpp:70-309 scene ctors,
StatsSceneBuilder report at main.cpp:311-324)."""

import numpy as np
import pytest

from pt_three_ways_tpu.models.catalog import SCENES, add_cube, create_scene, hex_colour
from pt_three_ways_tpu.models.scene import SceneBuilder, StatsSceneBuilder
from pt_three_ways_tpu.utils.render_params import RenderParams

PARAMS = RenderParams(width=64, height=64, samples_per_pixel=1)


def stats_for(name):
    ssb = StatsSceneBuilder()
    create_scene(ssb, name, PARAMS)
    return ssb


class TestCatalog:
    def test_all_scenes_buildable(self):
        for name in SCENES:
            sb = SceneBuilder()
            camera = create_scene(sb, name, PARAMS)
            scene = sb.build()
            assert scene.num_primitives > 0
            assert np.isfinite(np.asarray(camera.centre)).all()

    def test_cornell_counts(self):
        # CornellBox-Original.obj: 19 quad faces fan-decimated to 38
        # triangles, plus the reflective sphere the catalog adds
        # (main.cpp:70-86).
        s = stats_for("cornell")
        assert s.num_triangles == 38
        assert s.num_spheres == 1

    def test_suzanne_counts(self):
        # suzanne.obj: 500 faces -> 968 triangles, + 2 backdrop tris, 2 lights.
        s = stats_for("suzanne")
        assert s.num_triangles == 970
        assert s.num_spheres == 2

    def test_ce_counts(self):
        s = stats_for("ce")
        assert s.num_spheres == 3
        assert s.num_triangles > 2500  # 2,577 faces, some fan-decimated

    def test_sphere_scenes(self):
        assert stats_for("single-sphere").num_spheres == 3
        assert stats_for("multi-sphere").num_spheres == 47  # light + 9*5 grid + world
        assert stats_for("example1").num_spheres == 5
        assert stats_for("example1").num_triangles == 12  # the cube floor

    def test_bbc_owl_counts(self):
        s = stats_for("bbc-owl")
        owl_stars = 99  # count of '*' in the ASCII art
        assert s.num_spheres == owl_stars + 1  # + light
        assert s.num_triangles == 12

    def test_unknown_scene(self):
        with pytest.raises(ValueError, match="Unknown scene nope"):
            create_scene(StatsSceneBuilder(), "nope", PARAMS)


class TestHelpers:
    def test_hex_colour_degamma(self):
        c = hex_colour(0xFF8000)
        assert c[0] == pytest.approx(1.0)
        assert c[1] == pytest.approx((128 / 255) ** 2.2)
        assert c[2] == 0.0

    def test_add_cube_is_12_triangles(self):
        ssb = StatsSceneBuilder()
        add_cube(ssb, (-1, -1, -1), (1, 1, 1), None)
        assert ssb.num_triangles == 12
