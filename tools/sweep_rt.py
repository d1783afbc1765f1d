"""Sweep the regen-megakernel tile size (PT3_RT) on one scene.

The round-3 residual analysis (VALIDATION.md) concluded suzanne's last
~3 ms/pass vs the zero-waste estimate is no longer tail-shaped and named
smaller regen tiles as the structural lever: a tile's while-loop runs
until its SLOWEST lane converges, so smaller tiles bound the divergence
blast radius — at the price of paying the broadcast scene-table load
(and per-program fixed cost) more often. Each RT value runs in a FRESH
subprocess (RT is an import-time constant, and jit caches key on it via
shapes).

Usage: python tools/sweep_rt.py [scene] [rt ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(scene: str, rt: int) -> dict:
    code = (
        "import json, bench; "
        f"print('RESULT ' + json.dumps(bench.bench_scene({scene!r})))"
    )
    env = dict(os.environ, PT3_RT=str(rt))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    return {
        "error": (proc.stderr or "no output")[-500:],
        "rc": proc.returncode,
    }


def main() -> int:
    args = sys.argv[1:]
    scene = args[0] if args else "suzanne"
    rts = [int(a) for a in args[1:]] or [1024, 512, 256]
    for rt in rts:
        res = run_one(scene, rt)
        print(json.dumps({"rt": rt, **res}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
