"""Dispatch tiling: the per-dispatch path cap and the pass-fusion-aware
HBM budget (models/render._tile_rows).

The regen megakernel's precomputed state/uniform tables grow linearly
with passes_per_dispatch, so _tile_rows must shrink the tile to keep
ppd=32 (the open-scene optimum) inside STATE_TABLE_BUDGET_BYTES at any
resolution — the bug class this guards against is the 1024² render that
fits at ppd=8 but OOMs at 32.
"""

import numpy as np

from pt_three_ways_tpu.models.render import (
    STATE_TABLE_BUDGET_BYTES,
    _tile_rows,
)
from pt_three_ways_tpu.utils.render_params import RenderParams


def _params(w=1024, h=1024):
    return RenderParams(width=w, height=h, samples_per_pixel=8, seed=1)


def test_tile_rows_shrink_with_pass_fusion():
    p = _params()
    r8 = _tile_rows(p, 8)
    r32 = _tile_rows(p, 32)
    assert 1 <= r32 <= r8 <= p.height


def test_tile_rows_respect_state_table_budget():
    p = _params()
    nb = max(p.max_depth - 1, 0)
    for rng_mode, per_path in (
        # kernel mode: the [10*SP, N] sample-major layout, SP = samples
        # padded to the 8-sublane tile (mirrors _tile_rows round 5)
        ("kernel", lambda ppd: 10 * 4 * (-(-ppd // 8) * 8)),
        ("table", lambda ppd: (11 + 4 * nb) * 4 * ppd),  # state + uniforms
    ):
        pm = p.replace(rng_mode=rng_mode)
        for ppd in (1, 8, 32, 64):
            rows = _tile_rows(pm, ppd)
            paths = rows * pm.width * pm.first_bounce_samples
            bytes_needed = paths * per_path(ppd)
            # a single guaranteed-minimum tile (1<<16 paths) may exceed the
            # budget by design; anything larger must fit
            if paths > 1 << 16:
                assert bytes_needed <= STATE_TABLE_BUDGET_BYTES


def test_tile_rows_cover_frame_exactly_once():
    p = _params(w=256, h=100)
    rows = _tile_rows(p, 32)
    n_tiles = -(-p.height // rows)
    covered = np.zeros(p.height, bool)
    for t in range(n_tiles):
        y0 = t * rows
        covered[y0 : min(y0 + rows, p.height)] = True
    assert covered.all()
