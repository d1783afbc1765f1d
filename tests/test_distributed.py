"""Multi-process distributed tests: 2 localhost CPU processes via
jax.distributed.initialize (4 virtual devices each -> 8 global).

Covers parallel/distributed.py end to end:
  * initialize() + the global device view,
  * a cross-process collective over global_mesh (psum over dp spans DCN
    between the two processes),
  * the elastic multi-host render path — each host renders its own sample
    range over its LOCAL devices, writes a per-host .raw checkpoint
    (host_local_checkpoint_path), and the merge (merge_host_checkpoints)
    equals a single-process render of all samples EXACTLY (associative
    (sum,count) accumulation — the reference's raw_to_png multi-run story,
    src/main/raw_to_png.cpp:41-80).

Workers run as subprocesses with their own XLA runtime; the parent asserts
on their outputs. Skipped if port binding fails (sandboxed CI).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1])
addr = sys.argv[2]
outdir = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})

import jax
import numpy as np
jax.config.update("jax_platforms", "cpu")

from pt_three_ways_tpu.parallel.distributed import (
    global_mesh, host_local_checkpoint_path, initialize,
)

initialize(coordinator_address=addr, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

# --- cross-process collective over the GLOBAL mesh: psum over dp crosses
# the process boundary (dp=2 -> one replica per process) ---
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

mesh = global_mesh(dp=2)
f = jax.jit(jax.shard_map(
    lambda x: jax.lax.psum(x, ("dp", "sp")),
    mesh=mesh, in_specs=P(("dp", "sp")), out_specs=P(),
    check_vma=False,
))
from jax.sharding import NamedSharding
sharding = NamedSharding(mesh, P(("dp", "sp")))
local = np.arange(8, dtype=np.float32)
garr = jax.make_array_from_process_local_data(sharding, local[pid * 4:(pid + 1) * 4])
total = float(np.asarray(jax.device_get(f(garr))))
assert total == float(np.arange(8, dtype=np.float32).sum()), total

# --- elastic per-host render: this host renders samples [2*pid, 2*pid+2)
# over its LOCAL devices, checkpointing to its own .raw ---
from pt_three_ways_tpu.parallel.mesh import make_mesh
from pt_three_ways_tpu.parallel.shard import render_sharded
from tests.test_sharding import build

scene, camera, params = build()
params = params.replace(samples_per_pixel=2 * (pid + 1))
local_mesh = make_mesh(devices=jax.local_devices(), dp=1)
out = render_sharded(scene, camera, params, local_mesh)
if pid == 1:
    # drop this host's copy of samples [0, 2): simulate disjoint sample
    # ranges by rendering [0, 4) and subtracting the [0, 2) prefix — the
    # (sum, count) form keeps this exact.
    from pt_three_ways_tpu.utils.framebuffer import ArrayOutput
    prefix = render_sharded(
        scene, camera, params.replace(samples_per_pixel=2), local_mesh
    )
    out.sum -= prefix.sum
    out.count -= prefix.count
path = host_local_checkpoint_path(os.path.join(outdir, "render.raw"))
out.save(path)
print("WORKER_OK", pid, path)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render_and_merge(tmp_path):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("cannot bind localhost port")
    addr = f"127.0.0.1:{port}"
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER.replace("{repo!r}", repr(REPO)))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), addr, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out

    # merge the per-host checkpoints and compare with a single-process
    # 4-sample render over the same (dp=1, sp=4) local mesh + key scheme
    from pt_three_ways_tpu.parallel.distributed import merge_host_checkpoints
    from pt_three_ways_tpu.parallel.mesh import make_mesh
    from pt_three_ways_tpu.parallel.shard import render_sharded
    from tests.test_sharding import build

    base = str(tmp_path / "render.raw")
    merged = merge_host_checkpoints(base, str(tmp_path / "merged.raw"))
    assert (merged.count == 4).all()

    scene, camera, params = build()
    params = params.replace(samples_per_pixel=4)
    mesh = make_mesh(n_devices=4, dp=1)
    single = render_sharded(scene, camera, params, mesh)
    np.testing.assert_allclose(merged.sum, single.sum, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(merged.count, single.count)
