"""Repo self-containedness: all OBJ scenes resolve to the vendored assets."""

import os

from pt_three_ways_tpu.utils.assets import scenes_dir


def test_scenes_resolve_to_vendored_dir(monkeypatch):
    monkeypatch.delenv("PT3_SCENES", raising=False)
    d = scenes_dir()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert d == os.path.join(repo, "scenes")
    for f in ("CornellBox-Original.obj", "CornellBox-Original.mtl",
              "suzanne.obj", "suzanne.mtl", "ce.obj", "ce.mtl"):
        assert os.path.exists(os.path.join(d, f)), f
