"""Root-cause probe for the smallpt +3% brightness residual.

smallpt clamps each subpixel MEAN to [0,1] before averaging
(smallpt.cpp:158-159) — a negative bias proportional to the estimator's
upper-tail mass, so two correct implementations with different per-sample
variance produce different clamped means. This tool removes the clamp from
BOTH sides and compares raw linear radiance:

  * the reference smallpt.cpp is sed-patched IN /tmp (clamp -> identity,
    plus a float64 .raw dump next to the PPM) and compiled with g++ -fopenmp;
  * ours runs with render_smallpt(clamp_subpixels=False).

If the unclamped means agree, the clamped-mode gap is pinned to clamp-bias
asymmetry (our always-split refraction estimator has different tail mass —
models/smallpt.py docstring); if they still differ, there is a genuine
estimator brightness bug to hunt.

Usage: python tools/compare_smallpt_unclamped.py [spp]
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/src/smallpt/smallpt.cpp"
W, H = 640, 480


def build_unclamped(workdir: str) -> str:
    src = open(REF).read()
    # 1) clamp -> identity at the subpixel accumulation site only
    src = src.replace(
        "c[i] = c[i] + Vec(clamp(r.x), clamp(r.y), clamp(r.z)) * .25;",
        "c[i] = c[i] + Vec(r.x, r.y, r.z) * .25;",
    )
    # 2) dump raw doubles before the PPM quantisation
    src = src.replace(
        'FILE *f = fopen("image.ppm", "w");',
        'FILE *rf = fopen("image.raw", "wb");'
        " fwrite(c, sizeof(Vec), w * h, rf); fclose(rf);\n"
        '  FILE *f = fopen("image.ppm", "w");',
    )
    cpp = os.path.join(workdir, "smallpt_unclamped.cpp")
    with open(cpp, "w") as f:
        f.write(src)
    exe = os.path.join(workdir, "smallpt_unclamped")
    subprocess.run(
        ["g++", "-O3", "-fopenmp", cpp, "-o", exe], check=True
    )
    return exe


def block_mean(img, b=16):
    h, w = img.shape[:2]
    return img[: h // b * b, : w // b * b].reshape(
        h // b, b, w // b, b, 3
    ).mean(axis=(1, 3))


def main() -> int:
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    workdir = "/tmp/smallpt_unclamped"
    os.makedirs(workdir, exist_ok=True)

    raw = os.path.join(workdir, "image.raw")
    if not os.path.exists(raw + f".{spp}"):
        exe = build_unclamped(workdir)
        subprocess.run([exe, str(spp)], cwd=workdir, check=True)
        os.rename(raw, raw + f".{spp}")
    ref = np.fromfile(raw + f".{spp}", np.float64).reshape(H, W, 3)

    from pt_three_ways_tpu.models.smallpt import render_smallpt

    ours = render_smallpt(W, H, spp=spp, seed=7, clamp_subpixels=False)

    print(f"unclamped @ {spp} spp:")
    print(f"  ref mean  {ref.mean():.5f}")
    print(f"  ours mean {ours.mean():.5f}  "
          f"({(ours.mean() / ref.mean() - 1) * 100:+.2f}%)")
    rb, ob = block_mean(ref), block_mean(ours)
    rel = np.abs(rb - ob) / np.maximum(rb, 0.02)
    print(f"  block rel diff mean {rel.mean()*100:.2f}%  "
          f"p95 {np.percentile(rel, 95)*100:.2f}%")
    ok = abs(ours.mean() / ref.mean() - 1) < 0.01
    print("PASS (means within 1%)" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
