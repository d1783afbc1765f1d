"""Golden-image regression tests — the gap SURVEY.md section 4 calls out in
the reference ("no image-regression / golden-image tests").

Tiny deterministic CPU renders are compared against committed .npy goldens.
Regenerate after INTENTIONAL estimator changes with:
    python tests/test_golden_images.py --regen
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CASES = {
    "cornell": dict(scene="cornell", width=32, height=32, spp=2),
    "single-sphere": dict(scene="single-sphere", width=32, height=32, spp=2),
    "bbc-owl": dict(scene="bbc-owl", width=24, height=24, spp=1),
    "example1": dict(scene="example1", width=24, height=24, spp=1),
    # OBJ-mesh scenes: vertex-normal interpolation (suzanne has none in the
    # reference path — face normals), quad fan decimation, Morton chunking
    "suzanne": dict(scene="suzanne", width=24, height=24, spp=1),
    "ce": dict(scene="ce", width=24, height=24, spp=1),
    "multi-sphere": dict(scene="multi-sphere", width=24, height=24, spp=1),
}


def render_case(cfg):
    from pt_three_ways_tpu.models.catalog import create_scene
    from pt_three_ways_tpu.models.render import render
    from pt_three_ways_tpu.models.scene import SceneBuilder
    from pt_three_ways_tpu.utils.render_params import RenderParams

    params = RenderParams(
        width=cfg["width"], height=cfg["height"],
        samples_per_pixel=cfg["spp"], seed=11,
        first_bounce_u_samples=2, first_bounce_v_samples=2, max_depth=4,
    )
    sb = SceneBuilder()
    camera = create_scene(sb, cfg["scene"], params)
    scene = sb.build()
    out = render(scene, camera, params)
    return out.mean().astype(np.float32)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} missing (run --regen)")
    golden = np.load(path)
    img = render_case(CASES[name])
    assert img.shape == golden.shape
    # identical seed/config; tolerance covers compiler/backend drift only
    np.testing.assert_allclose(img, golden, atol=5e-5, rtol=5e-4)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")  # goldens are CPU-generated
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, cfg in CASES.items():
            img = render_case(cfg)
            np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), img)
            print(f"wrote {name}: mean={img.mean():.5f}")
