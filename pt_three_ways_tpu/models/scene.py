"""Scene representation: host-side builder -> device-side SoA arrays.

TPU-native redesign of the reference's DoD scene (src/dod/Scene.h:25-31):
parallel arrays for spheres and triangles plus a deduplicated material table.
Two deliberate departures from the reference, both for the MXU:

  * Spheres store ``centre``, ``radius_sq`` AND ``centre_sq`` (|c|^2) so the
    per-(ray, sphere) quadratic becomes two [R,3]x[3,S] matmuls plus
    elementwise ops (see ops/intersect.py).
  * Triangles are stored as Woop affine transforms: a 3x4 matrix per triangle
    mapping world space to (u, v, w) barycentric-plane space, so the
    per-(ray, triangle) Moller-Trumbore test becomes two [R,4]x[4,3T] matmuls
    plus elementwise ops. ``normals`` keeps the per-vertex normals used for
    interpolation (src/dod/Scene.cpp:99-113).

The builder implements the reference's duck-typed SceneBuilder contract
(addTriangle / addSphere / setEnvironmentColour, src/main/main.cpp:291-324)
so the scene catalog and OBJ loader drive it identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..models.materials import MaterialInterner, MaterialSpec, MaterialTable


class SphereArrays(NamedTuple):
    centre: jnp.ndarray  # [S, 3]
    radius_sq: jnp.ndarray  # [S]
    centre_sq: jnp.ndarray  # [S]  |centre|^2, precomputed for the matmul form
    mat_id: jnp.ndarray  # [S] int32


class TriangleArrays(NamedTuple):
    # Woop transform: rows of M^{-1} where M = [e1 e2 n_un] (columns), plus
    # the translation -M^{-1} v0. Packed [T, 3, 4]: world point x maps to
    # (u, v, w) = woop[:, :, :3] @ x + woop[:, :, 3].
    woop: jnp.ndarray  # [T, 3, 4]
    normals: jnp.ndarray  # [T, 3, 3] per-vertex normals (n0, n1, n2)
    mat_id: jnp.ndarray  # [T] int32
    # Raw vertices kept for BVH build / differentiable-geometry extensions.
    verts: jnp.ndarray  # [T, 3, 3]


class Scene(NamedTuple):
    """Device-side SoA scene. A pytree: shardable, jit-traceable, grad-able."""

    spheres: SphereArrays
    triangles: TriangleArrays
    materials: MaterialTable
    environment: jnp.ndarray  # [3]

    @property
    def num_spheres(self) -> int:
        return self.spheres.centre.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.triangles.woop.shape[0]

    @property
    def num_primitives(self) -> int:
        return self.num_spheres + self.num_triangles


def _woop_from_verts(verts: np.ndarray) -> np.ndarray:
    """Per-triangle world->(u,v,w) affine transforms. verts: [T, 3, 3] f64."""
    v0 = verts[:, 0]
    e1 = verts[:, 1] - v0  # "uVector" (dod/TriangleVertices.h:24-26)
    e2 = verts[:, 2] - v0  # "vVector"
    n = np.cross(e1, e2)  # unnormalised face normal
    m = np.stack([e1, e2, n], axis=-1)  # [T, 3, 3] columns e1,e2,n
    # Degenerate triangles (zero area) get a transform that never accepts:
    # we regularise the matrix and later rely on the w-division to produce
    # out-of-range barycentrics.
    dets = np.linalg.det(m)
    bad = np.abs(dets) < 1e-30
    if bad.any():
        m = m.copy()
        m[bad] = np.eye(3)
    minv = np.linalg.inv(m)  # [T, 3, 3] rows map x -> (u, v, w)
    trans = -np.einsum("tij,tj->ti", minv, v0)  # [T, 3]
    woop = np.concatenate([minv, trans[:, :, None]], axis=-1)  # [T, 3, 4]
    if bad.any():
        woop[bad] = 0.0  # w' == 0 everywhere -> rejected as parallel
    return woop


@dataclass
class SceneBuilder:
    """Host-side accumulation; ``build()`` freezes to device arrays.

    Duck-type compatible with the reference's SceneBuilder contract
    (src/main/main.cpp:291-309): add_triangle, add_sphere,
    set_environment_colour. snake_case is the native spelling; camelCase
    aliases are provided for drop-in familiarity.
    """

    _tri_verts: list = field(default_factory=list)
    _tri_normals: list = field(default_factory=list)
    _tri_mats: list = field(default_factory=list)
    _sph_centres: list = field(default_factory=list)
    _sph_radii: list = field(default_factory=list)
    _sph_mats: list = field(default_factory=list)
    _materials: MaterialInterner = field(default_factory=MaterialInterner)
    _environment: tuple = (0.0, 0.0, 0.0)

    def add_triangle(self, v0, v1, v2, material: MaterialSpec, normals=None):
        verts = np.array([v0, v1, v2], dtype=np.float64)
        if normals is None:
            # Default vertex normals to the face normal, as the reference does
            # (src/dod/Scene.cpp:181-187, src/oo/Triangle.cpp:43-47).
            e1 = verts[1] - verts[0]
            e2 = verts[2] - verts[0]
            n = np.cross(e1, e2)
            ln = np.linalg.norm(n)
            n = n / ln if ln > 0 else np.array([0.0, 0.0, 1.0])
            normals = np.array([n, n, n])
        self._tri_verts.append(verts)
        self._tri_normals.append(np.asarray(normals, dtype=np.float64))
        self._tri_mats.append(self._materials.intern(material))

    def add_triangles_soa(self, verts, mat_rows, mat_ids) -> None:
        """Bulk triangle ingest from the native OBJ parser
        (utils/native.parse_obj_native): verts [n, 3, 3] f64, mat_rows
        [m, 9] = (emission 3, diffuse 3, ior, reflectivity, cone), mat_ids
        [n] int32 indices into mat_rows. Same semantics as n add_triangle
        calls (face normals, material interning) without the Python loop."""
        verts = np.asarray(verts, np.float64)
        n = verts.shape[0]
        if n == 0:
            return
        e1 = verts[:, 1] - verts[:, 0]
        e2 = verts[:, 2] - verts[:, 0]
        nrm = np.cross(e1, e2)
        ln = np.linalg.norm(nrm, axis=1, keepdims=True)
        nrm = np.where(ln > 0, nrm / np.maximum(ln, 1e-300), (0.0, 0.0, 1.0))
        normals = np.repeat(nrm[:, None, :], 3, axis=1)  # [n, 3, 3]
        local = [
            self._materials.intern(
                MaterialSpec(
                    emission=(r[0], r[1], r[2]),
                    diffuse=(r[3], r[4], r[5]),
                    index_of_refraction=float(r[6]),
                    reflectivity=float(r[7]),
                    reflection_cone_angle_radians=float(r[8]),
                )
            )
            for r in np.asarray(mat_rows, np.float64)
        ]
        remap = (
            np.asarray(local, np.int32)[np.asarray(mat_ids, np.int32)]
            if local
            else np.zeros(n, np.int32)
        )
        self._tri_verts.extend(verts)
        self._tri_normals.extend(normals)
        self._tri_mats.extend(remap.tolist())

    def add_sphere(self, centre, radius: float, material: MaterialSpec):
        self._sph_centres.append(np.asarray(centre, dtype=np.float64).reshape(3))
        self._sph_radii.append(float(radius))
        self._sph_mats.append(self._materials.intern(material))

    def set_environment_colour(self, colour):
        c = np.asarray(colour, dtype=np.float64).reshape(3)
        self._environment = (float(c[0]), float(c[1]), float(c[2]))

    # camelCase aliases for reference-API familiarity
    addTriangle = add_triangle
    addSphere = add_sphere
    setEnvironmentColour = set_environment_colour

    @property
    def num_triangles(self) -> int:
        return len(self._tri_verts)

    @property
    def num_spheres(self) -> int:
        return len(self._sph_centres)

    def build(self, dtype=jnp.float32, morton: bool = True) -> Scene:
        if self._tri_verts:
            verts = np.stack(self._tri_verts)  # [T, 3, 3]
            normals = np.stack(self._tri_normals)
            tri_mats = np.asarray(self._tri_mats, dtype=np.int32)
            if morton and len(self._tri_verts) > 64:
                # Spatial (Morton) ordering so consecutive triangle chunks
                # are compact in space — the cluster-culling BVH level in
                # ops/pallas_intersect.py keys off this. Oversized triangles
                # (e.g. backdrop quads) are segregated at the end so they
                # don't inflate the AABB of an otherwise-tight chunk.
                # Semantics unchanged except exact-tie winners (scan order),
                # as in the reference.
                from ..utils.native import morton_order

                diag = np.linalg.norm(
                    verts.max(axis=1) - verts.min(axis=1), axis=1
                )
                large = diag > 4.0 * max(np.median(diag), 1e-12)
                order = morton_order(verts.mean(axis=1))
                order = np.concatenate(
                    [order[~large[order]], order[large[order]]]
                )
                verts = verts[order]
                normals = normals[order]
                tri_mats = tri_mats[order]
            woop = _woop_from_verts(verts)
        else:
            verts = np.zeros((0, 3, 3))
            normals = np.zeros((0, 3, 3))
            woop = np.zeros((0, 3, 4))
            tri_mats = np.zeros((0,), dtype=np.int32)
        if self._sph_centres:
            centres = np.stack(self._sph_centres)
            radii = np.asarray(self._sph_radii)
            sph_mats = np.asarray(self._sph_mats, dtype=np.int32)
        else:
            centres = np.zeros((0, 3))
            radii = np.zeros((0,))
            sph_mats = np.zeros((0,), dtype=np.int32)
        return Scene(
            spheres=SphereArrays(
                centre=jnp.asarray(centres, dtype),
                radius_sq=jnp.asarray(radii * radii, dtype),
                centre_sq=jnp.asarray(np.sum(centres * centres, -1), dtype),
                mat_id=jnp.asarray(sph_mats),
            ),
            triangles=TriangleArrays(
                woop=jnp.asarray(woop, dtype),
                normals=jnp.asarray(normals, dtype),
                mat_id=jnp.asarray(tri_mats),
                verts=jnp.asarray(verts, dtype),
            ),
            materials=self._materials.build(dtype),
            environment=jnp.asarray(np.asarray(self._environment), dtype),
        )


class StatsSceneBuilder:
    """Counting mock, as in the reference (src/main/main.cpp:311-324)."""

    def __init__(self):
        self.num_triangles = 0
        self.num_spheres = 0

    def add_triangle(self, *args, **kw):
        self.num_triangles += 1

    def add_sphere(self, *args, **kw):
        self.num_spheres += 1

    def set_environment_colour(self, *args, **kw):
        pass

    addTriangle = add_triangle
    addSphere = add_sphere
    setEnvironmentColour = set_environment_colour

    def report(self) -> str:
        return (
            f"Scene contains {self.num_triangles} triangles and "
            f"{self.num_spheres} spheres."
        )


def auto_epsilon(scene: Scene, camera) -> float:
    """Geometric epsilon derived from scene scale (replaces the per-scene
    EPSILON_HINT lookup for unseen scenes; reference: the global 1e-9
    double Epsilon, src/math/Epsilon.h:3, which f32 cannot honour).

    The binding f32 failure mode is the grazing-sphere catastrophic
    cancellation in ``minus_t = b - sqrt(det)``: the absolute t error is
    ~|b| * 2^-12 near det ~ 0, where |b| is of the order of the
    camera-to-primitive distance (bbc-owl root-cause, VALIDATION.md round
    3: O(1e-3) distance error at camera distance ~7 needed eps 1e-3, while
    the 1e-4 default re-admitted self-hits that darkened the image 5%).
    Rule: 2^-12 * median primitive distance from the camera, clamped to
    the validated band [1e-4, 1e-3] (refgate 7/7 PASS at the auto values;
    VALIDATION.md round 4).
    """
    centres = []
    tv = np.asarray(scene.triangles.verts, np.float64)
    if tv.size:
        centres.append(tv.mean(axis=1))  # [T, 3] centroids
    sc = np.asarray(scene.spheres.centre, np.float64)
    if sc.size:
        centres.append(sc)
    if not centres:
        return 1e-4
    pts = np.concatenate(centres, axis=0)
    cam = np.asarray(camera.centre, np.float64).reshape(1, 3)
    med = float(np.median(np.linalg.norm(pts - cam, axis=1)))
    return float(np.clip(med * 2.0 ** -12, 1e-4, 1e-3))
