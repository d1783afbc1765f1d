"""smallpt sidecar tests: scene data integrity, determinism, and basic
radiometric sanity of the RR + refraction integrator."""

import numpy as np
import pytest

from pt_three_ways_tpu.models.smallpt import (
    DIFF,
    REFR,
    SPEC,
    render_smallpt,
    smallpt_scene,
)


def test_scene_data():
    s = smallpt_scene()
    assert s.centre.shape == (9, 3)
    types = np.asarray(s.refl_type)
    assert (types == SPEC).sum() == 1
    assert (types == REFR).sum() == 1
    assert (types == DIFF).sum() == 7
    # the light
    assert float(np.asarray(s.emission).max()) == 12.0


def test_render_small():
    img = render_smallpt(32, 24, spp=8, seed=1, max_bounces=12)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()  # subpixel-clamped
    # scene is lit: interior should not be black
    assert img.mean() > 0.05
    # the ceiling light region (top rows after y-flip) should be bright
    assert img[:4].mean() > img.mean()


def test_determinism():
    a = render_smallpt(16, 16, spp=4, seed=3, max_bounces=8)
    b = render_smallpt(16, 16, spp=4, seed=3, max_bounces=8)
    np.testing.assert_array_equal(a, b)
    c = render_smallpt(16, 16, spp=4, seed=4, max_bounces=8)
    assert not np.array_equal(a, c)


def test_left_right_wall_colours():
    # left wall is red-ish, right wall blue-ish (smallpt.cpp:58-61)
    img = render_smallpt(48, 36, spp=16, seed=2, max_bounces=10)
    left = img[10:26, :6]
    right = img[10:26, -6:]
    assert left[..., 0].mean() > left[..., 2].mean() * 1.3
    assert right[..., 2].mean() > right[..., 0].mean() * 1.3
