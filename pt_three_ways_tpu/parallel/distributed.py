"""Multi-host orchestration.

The reference's "multi-node" story is filesystem-level: run the binary k
times with different seeds and merge the .raw checkpoints offline
(src/main/raw_to_png.cpp). We keep that elastic path (it works across
TPU pods too — every host writes its own .raw and any machine merges), and
add the first-class SPMD path: ``jax.distributed`` + a global (dp, sp) mesh
whose framebuffer reduction rides ICI within a slice and DCN across hosts.

Single-process multi-device works with plain `make_mesh`; these helpers add
the multi-process bits. They are exercised on one host via the driver's
virtual-device dry-run (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..utils.framebuffer import ArrayOutput
from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1") or 1)
    if not addr or n <= 1:
        return
    pid = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=n, process_id=pid
    )


def global_mesh(dp: int = 1):
    """(dp, sp) mesh over ALL processes' devices (jax.devices() is global
    after jax.distributed.initialize)."""
    return make_mesh(dp=dp)


def host_local_checkpoint_path(base: str) -> str:
    """Per-host .raw path so every process checkpoints independently; any
    host (or the reference's raw_to_png!) can merge them afterwards."""
    pid = jax.process_index() if jax.process_count() > 1 else 0
    root, ext = os.path.splitext(base)
    return f"{root}.host{pid}{ext}" if jax.process_count() > 1 else base


def merge_host_checkpoints(base: str, out_path: str) -> ArrayOutput:
    """Merge all `<base>.host*.raw` checkpoints exactly (associative
    (sum,count) accumulation — ArrayOutput.cpp:48-57 contract)."""
    import glob

    root, ext = os.path.splitext(base)
    paths = sorted(glob.glob(f"{root}.host*{ext}")) or [base]
    acc = ArrayOutput.load(paths[0])
    for p in paths[1:]:
        acc += ArrayOutput.load(p)
    acc.save(out_path)
    return acc
