"""Roofline / utilization estimate for the regen megakernel (the aux
"tracing/profiling" row of SURVEY section 5 — MFU analogue for a VPU-bound
kernel).

The intersect stage is VPU work (VALIDATION.md: the MXU form was raced and
lost 3x), so the relevant peak is the vector unit, not the MXU. Model:

  per live ray-bounce the kernel evaluates every triangle chunk:
      ops_ray = n_chunks * rows_per_chunk * OPS_PER_ROW  (+ sphere rows)
  achieved = ops_ray * rays_per_second
  utilization = achieved / VPU_PEAK  (whole-kernel, and intersect-only
  using the slope-profile fraction from VALIDATION.md)

HBM side: the regen dispatch streams the per-sample state/uniform tables
once per S passes; bytes/pass = (10 + 4*nb) * N * 4 — reported against
the public 819 GB/s v5e figure to show the kernel is compute-bound.

Peaks are public-figure estimates (v5e: 8x128 VPU lanes x 4 ALUs x
~0.94 GHz ~= 3.9 Tops/s f32; HBM 819 GB/s). Measurements come from
bench.py output passed on the command line or the r2-final defaults.

Usage:
  python tools/roofline.py                      # r2-final numbers
  python tools/roofline.py suzanne 23.45 57.61  # scene, Mray/s, ms/pass
"""

from __future__ import annotations

import sys

VPU_PEAK = 8 * 128 * 4 * 0.94e9  # f32 vector ops/s, v5e estimate
HBM_GBS = 819.0  # v5e public figure

# per-[row, RT] vector-op count of one triangle-chunk row: 22 fma for the
# six Woop dot products, 3 reciprocal+Newton, 3 t/u/v, 7 compares/ands,
# ~12 for the two winner reductions and selects, ~5 misc selects
OPS_PER_TRI_ROW = 52
OPS_PER_SPH_ROW = 30

# scene geometry after Morton chunking (PackedSceneFused): chunk rows are
# padded to 8 sublanes (sub-chunk padding, VALIDATION.md)
SCENES = {
    # name: (tri_rows_dispatched, sph_rows, intersect_fraction)
    "cornell": (40, 8, 0.73),  # 38 tris -> one 40-row chunk; 1 sphere
    "suzanne": (1024, 8, 0.73),  # 968 tris -> 16 x 64-row chunks
    "ce": (3456, 8, 0.73),  # 3442 tris -> 54 x 64-row chunks
}

# r2-final measurements (bench.py on v5e, post lax.scan build)
DEFAULTS = {
    "cornell": (202.11, 18.0),
    "suzanne": (37.54, 35.99),
    "ce": (12.22, 5.36),
}

N_LANES = 256 * 256 * 16
NB = 4  # depth 5 -> 4 in-kernel bounces


def report(scene: str, mray_s: float, ms_pass: float) -> None:
    tri_rows, sph_rows, frac = SCENES[scene]
    ops_ray = tri_rows * OPS_PER_TRI_ROW + sph_rows * OPS_PER_SPH_ROW
    achieved = ops_ray * mray_s * 1e6
    util = achieved / VPU_PEAK
    util_intersect = util / frac
    hbm_bytes = (10 + 4 * NB) * N_LANES * 4
    hbm_gbs = hbm_bytes / (ms_pass / 1e3) / 1e9
    print(
        f"{scene:8s} {mray_s:7.2f} Mray/s  {ops_ray:6d} VPU-ops/ray  "
        f"{achieved/1e12:5.2f} Tops/s = {util*100:4.1f}% of VPU peak "
        f"(intersect-only ~{util_intersect*100:.0f}%)  "
        f"HBM {hbm_gbs:5.1f}/{HBM_GBS:.0f} GB/s ({hbm_gbs/HBM_GBS*100:.1f}%)"
    )


def main() -> int:
    if len(sys.argv) > 1:
        if len(sys.argv) != 4 or sys.argv[1] not in SCENES:
            print(
                "usage: roofline.py [scene Mray/s ms/pass]  "
                f"(scene in {sorted(SCENES)})",
                file=sys.stderr,
            )
            return 1
        report(sys.argv[1], float(sys.argv[2]), float(sys.argv[3]))
        return 0
    print(f"VPU peak estimate {VPU_PEAK/1e12:.2f} Tops/s (f32); HBM "
          f"{HBM_GBS:.0f} GB/s — v5e public figures")
    for scene, (mray, ms) in DEFAULTS.items():
        report(scene, mray, ms)
    print("conclusion: compute-bound on the VPU everywhere; HBM is idle. "
          "Mray/s counts LIVE rays only, so low-occupancy tails depress "
          "the utilisation figure, not extra per-ray work.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
