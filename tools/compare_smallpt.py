"""Statistical oracle comparison: our smallpt sidecar vs the reference
smallpt.cpp binary.

The reference mt19937/erand48 streams cannot be replicated bitwise
(SURVEY.md section 6b.4), so the gate is statistical: block-averaged images
must agree within a few linear-light percent at matched spp.

Usage:
  1. g++ -O3 -fopenmp /root/reference/src/smallpt/smallpt.cpp -o /tmp/smallpt
  2. (cd /tmp && ./smallpt 64)        # writes /tmp/image.ppm at 640x480
  3. python tools/compare_smallpt.py /tmp/image.ppm 64
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def read_ppm(path: str) -> np.ndarray:
    """Reads the P3 ppm smallpt writes -> [H, W, 3] uint8."""
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "P3"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.array(tokens[4:], dtype=np.int64).reshape(h, w, 3)
    assert maxv == 255
    return data.astype(np.uint8)


def block_mean(img: np.ndarray, b: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h // b * b, : w // b * b].reshape(
        h // b, b, w // b, b, 3
    ).mean(axis=(1, 3))


def main() -> int:
    ppm_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/image.ppm"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pt_three_ways_tpu.models.smallpt import render_smallpt
    from pt_three_ways_tpu.utils.framebuffer import srgb8

    ref8 = read_ppm(ppm_path)
    h, w = ref8.shape[:2]
    print(f"reference {w}x{h}, comparing at {spp} spp")
    ours_lin = render_smallpt(w, h, spp=spp, seed=7)
    ours8 = srgb8(ours_lin)

    # compare in linear light, de-gamma'd, on 16x16 blocks
    ref_lin = (ref8.astype(np.float64) / 255.0) ** 2.2
    ours_lin8 = (ours8.astype(np.float64) / 255.0) ** 2.2
    rb = block_mean(ref_lin, 16)
    ob = block_mean(ours_lin8, 16)
    diff = np.abs(rb - ob)
    denom = np.maximum(rb, 0.02)
    rel = diff / denom
    print(f"mean abs diff (linear, 16px blocks): {diff.mean():.4f}")
    print(f"mean rel diff: {rel.mean()*100:.2f}%   p95: {np.percentile(rel,95)*100:.2f}%")
    print(f"ref mean {ref_lin.mean():.4f}  ours mean {ours_lin8.mean():.4f}")
    ok = rel.mean() < 0.10 and abs(ref_lin.mean() - ours_lin8.mean()) < 0.01
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
