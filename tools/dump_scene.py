"""Dumps a catalog scene (geometry + materials + camera + params) to the
plain-text format read by tools/refgate/driver.cpp.

The geometry comes from OUR catalog/ObjLoader via a duck-typed capture
builder — so the reference oracle renders exactly the triangles/spheres our
framework renders, and the comparison isolates the ESTIMATOR (radiance,
intersection, camera, sampling). Camera setups mirror the reference's
createXxxScene constants (src/main/main.cpp:70-289); geometry/material calls
are captured from pt_three_ways_tpu.models.catalog which implements the same
constructors.

Usage: python tools/dump_scene.py <scene> <out.dump> \
           --width 256 --height 256 --spp 128 [--max-cpus 4] [--seed 1]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from pt_three_ways_tpu.models.catalog import create_scene
from pt_three_ways_tpu.utils.render_params import RenderParams

# scene -> (eye, look_at, up, vertical_fov_deg, focal_point, aperture)
# (src/main/main.cpp:78-86, 106-114, 130-137, 141-147, 167-173, 216-224,
#  280-288). Scenes without a setFocus call use aperture 0 (pinhole).
CAMERAS = {
    "cornell": ((0, 1, 3), (0, 1, 0), (0, 1, 0), 50.0, (0, 0, 0), 0.01),
    "suzanne": ((1, -0.45, 4), (1, -0.6, 0.4), (0, 1, 0), 40.0,
                (1, -0.6, 0.4), 0.01),
    "ce": ((0.27, 1.15, 0.36), (0, 0, 0), (0, 0, -1), 40.0, (0, 0, 0), 0.01),
    "single-sphere": ((0, 0, -3.2), (0, 0, 0), (0, 1, 0), 40.0,
                      (0, 0, 0), 0.0),
    "multi-sphere": ((0, 0, -3.2), (0, 0, 0), (0, 1, 0), 40.0,
                     (0, 0, 0), 0.0),
    "example1": ((0, 2, -5), (0, 0.25, 3), (0, 1, 0), 45.0,
                 (-0.75, 1, -1), 0.1),
    "bbc-owl": ((4, 2.0, -5), (0, 0.5, 0), (0, 1, 0), 33.0,
                (0, 0.5, 0), 0.1),
}


class DumpBuilder:
    """Duck-typed SceneBuilder that records primitives + a material table."""

    def __init__(self):
        self.materials = []
        self._mat_index = {}
        self.triangles = []
        self.spheres = []
        self.env = (0.0, 0.0, 0.0)

    def _mat(self, m) -> int:
        key = (
            tuple(np.asarray(m.emission, np.float64)),
            tuple(np.asarray(m.diffuse, np.float64)),
            float(m.index_of_refraction),
            float(m.reflectivity),
            float(m.reflection_cone_angle_radians),
        )
        if key not in self._mat_index:
            self._mat_index[key] = len(self.materials)
            self.materials.append(key)
        return self._mat_index[key]

    def add_triangle(self, v0, v1, v2, mat):
        self.triangles.append(
            (np.asarray(v0, np.float64), np.asarray(v1, np.float64),
             np.asarray(v2, np.float64), self._mat(mat))
        )

    def add_sphere(self, centre, radius, mat):
        self.spheres.append(
            (np.asarray(centre, np.float64), float(radius), self._mat(mat))
        )

    def set_environment_colour(self, colour):
        self.env = np.asarray(colour, np.float64)


def fmt(values) -> str:
    return " ".join(repr(float(v)) for v in np.asarray(values).ravel())


def dump_scene(scene: str, params: RenderParams, max_cpus: int = 4) -> str:
    builder = DumpBuilder()
    create_scene(builder, scene, params)
    # "-subN" scenes share the base scene's camera (pure scene-SIZE scaling)
    base = scene.partition("-sub")[0]
    eye, look_at, up, fov, focal, aperture = CAMERAS[base]
    lines = [
        f"# {scene} dump for tools/refgate/driver.cpp",
        f"p {params.width} {params.height} {params.samples_per_pixel} "
        f"{params.max_depth} {params.first_bounce_u_samples} "
        f"{params.first_bounce_v_samples} {params.seed} {max_cpus} "
        f"{int(params.preview)}",
        f"c {fmt(eye)} {fmt(look_at)} {fmt(up)} {fov!r} {fmt(focal)} "
        f"{aperture!r}",
        f"e {fmt(builder.env)}",
    ]
    for em, di, ior, refl, cone in builder.materials:
        lines.append(f"m {fmt(em)} {fmt(di)} {ior!r} {refl!r} {cone!r}")
    for v0, v1, v2, mi in builder.triangles:
        lines.append(f"t {fmt(v0)} {fmt(v1)} {fmt(v2)} {mi}")
    for c, r, mi in builder.spheres:
        lines.append(f"s {fmt(c)} {r!r} {mi}")
    return "\n".join(lines) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "scene",
        help="catalog scene name; a -subN suffix (e.g. suzanne-sub4) "
        "midpoint-subdivides every triangle N times",
    )
    ap.add_argument("out")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--max-depth", type=int, default=5)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--max-cpus", type=int, default=4)
    ap.add_argument("--preview", action="store_true")
    args = ap.parse_args(argv)
    params = RenderParams(
        width=args.width, height=args.height,
        samples_per_pixel=args.spp, max_depth=args.max_depth,
        seed=args.seed, preview=args.preview,
    )
    text = dump_scene(args.scene, params, args.max_cpus)
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {args.out}: {text.count(chr(10))} lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())
