"""Forward image-parity gate: OUR main estimator vs the COMPILED reference
DoD engine (src/dod/Scene.cpp), on the same geometry.

This is the north-star forward-correctness check (BASELINE.md): the
reference engine is compiled unmodified by tools/refgate/build.sh, fed the
exact triangles/spheres/materials our catalog produces (tools/dump_scene.py),
and both render the same config. RNG streams differ by construction
(mt19937 vs threefry — SURVEY.md section 6b.4), so the gate is statistical:
block-averaged linear radiance must agree to a few percent.

Usage:
  python tools/compare_ways.py cornell --size 256 --spp 128
  python tools/compare_ways.py suzanne --size 192 --spp 48 --platform cpu
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
REFGATE = os.path.join(HERE, "refgate")
REFDOD = os.path.join(REFGATE, "refdod")


def block_mean(img: np.ndarray, b: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h // b * b, : w // b * b].reshape(
        h // b, b, w // b, b, 3
    ).mean(axis=(1, 3))


def ensure_oracle() -> None:
    if not os.path.exists(REFDOD):
        subprocess.run([os.path.join(REFGATE, "build.sh")], check=True)


def run_reference(scene: str, params, max_cpus: int, workdir: str) -> np.ndarray:
    from tools.dump_scene import dump_scene

    dump = os.path.join(workdir, f"{scene}.dump")
    raw = os.path.join(workdir, f"ref_{scene}_{params.width}x{params.height}"
                                f"_{params.samples_per_pixel}.raw")
    with open(dump, "w") as f:
        f.write(dump_scene(scene, params, max_cpus))
    if not os.path.exists(raw):
        t0 = time.time()
        subprocess.run([REFDOD, dump, raw], check=True,
                       stdout=subprocess.DEVNULL)
        print(f"reference render: {time.time() - t0:.1f}s ({max_cpus} cpus)")
    else:
        print(f"reference render: cached {raw}")
    from pt_three_ways_tpu.utils.framebuffer import ArrayOutput

    return ArrayOutput.load(raw).mean()


def run_ours(scene: str, params) -> np.ndarray:
    from pt_three_ways_tpu.models.catalog import create_scene
    from pt_three_ways_tpu.models.render import render
    from pt_three_ways_tpu.models.scene import SceneBuilder

    sb = SceneBuilder()
    camera = create_scene(sb, scene, params)
    built = sb.build()
    t0 = time.time()
    out = render(built, camera, params, way="dod")
    print(f"our render: {time.time() - t0:.1f}s ({jax.default_backend()})")
    return out.mean()


def compare(ref: np.ndarray, ours: np.ndarray, block: int = 16,
            gate_rel: float = 0.05, gate_mean: float = 0.01):
    rb = block_mean(ref, block)
    ob = block_mean(ours, block)
    diff = np.abs(rb - ob)
    rel = diff / np.maximum(rb, 0.02)
    mean_gap = abs(ref.mean() - ours.mean())
    print(f"block {block}px linear: mean abs diff {diff.mean():.4f}")
    print(f"mean rel diff: {rel.mean()*100:.2f}%  "
          f"p95: {np.percentile(rel, 95)*100:.2f}%  "
          f"max: {rel.max()*100:.2f}%")
    print(f"ref mean {ref.mean():.4f}  ours mean {ours.mean():.4f}  "
          f"gap {mean_gap:.4f}")
    ok = rel.mean() < gate_rel and mean_gap < gate_mean
    print("PASS" if ok else "FAIL")
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="cornell")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--max-cpus", type=int, default=4)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--platform", default=None,
                    help="force jax platform for OUR render (e.g. cpu)")
    ap.add_argument("--workdir", default="/tmp/refgate")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pt_three_ways_tpu.models.catalog import (
        EPSILON_HINT, create_scene, hint_key,
    )
    from pt_three_ways_tpu.models.scene import SceneBuilder, auto_epsilon
    from pt_three_ways_tpu.utils.render_params import RenderParams

    params = RenderParams(
        width=args.size, height=args.size, samples_per_pixel=args.spp,
        seed=args.seed,
    )
    if hint_key(args.scene) in EPSILON_HINT:
        eps = EPSILON_HINT[hint_key(args.scene)]
    else:
        # same auto rule the CLI applies (models/scene.auto_epsilon) so
        # this gate validates exactly what ships
        _sb = SceneBuilder()
        _cam = create_scene(_sb, args.scene, params)
        eps = auto_epsilon(_sb.build(), _cam)
    print(f"epsilon: {eps:.2e}")
    params = params.replace(epsilon=eps)
    os.makedirs(args.workdir, exist_ok=True)
    ensure_oracle()
    ref = run_reference(args.scene, params, args.max_cpus, args.workdir)
    ours = run_ours(args.scene, params)
    np.save(os.path.join(args.workdir, f"ours_{args.scene}.npy"), ours)
    ok = compare(ref, ours, args.block)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
