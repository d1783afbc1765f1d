"""Device mesh construction.

The reference's parallel stack is threads + a mutex work queue
(src/util/WorkQueue.h, src/oo/Renderer.cpp:93-141). The TPU equivalent is a
jax.sharding.Mesh with two axes:

  * ``sp`` ("spatial"): pixels/rays sharded across devices — the analogue of
    tile-parallelism (src/oo/Renderer.cpp:143-183);
  * ``dp`` ("data"/sample): independent sample passes per device, merged with
    a psum — the analogue of the async full-screen-pass scheme
    (src/oo/Renderer.cpp:93-141) and of the offline raw_to_png merge
    (src/main/raw_to_png.cpp), since (sum,count) accumulation is associative.

Paths are independent, so no ring/Ulysses-style exchange exists: the ONLY
communication is the framebuffer reduction over ``dp`` (ICI) and, multi-host,
the final gather over DCN.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, sp) mesh over the visible devices.

    ``dp`` defaults to 1 (all devices shard rays spatially); pass dp > 1 to
    split devices between sample-parallel replicas and spatial shards.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        devs = devs[:n_devices]
    n = len(devs)
    dp = dp or 1
    if n % dp:
        raise ValueError(f"dp={dp} does not divide device count {n}")
    sp = n // dp
    arr = np.asarray(devs).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Rays/pixels sharded over sp, replicated over dp."""
    return NamedSharding(mesh, P(("dp", "sp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
