"""Material model.

Host-side ``MaterialSpec`` mirrors the reference POD
(src/util/MaterialSpec.h:7-40) so the scene catalog and OBJ/MTL loader read
the same; on device, materials live in a deduplicated SoA table
(``MaterialTable``) indexed by per-primitive ``mat_id`` — the TPU-native
replacement for the reference's per-primitive material copies / virtual
Material objects (src/oo/Material.cpp:69-75).

The 2-branch shading model (Fresnel-or-fixed reflectivity choosing a cone
reflection vs a diffuse-tinted hemisphere bounce) is implemented branch-free
in the integrators; `reflectivity < 0` is the "use Fresnel" sentinel exactly
as in the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

Vec = Tuple[float, float, float]

_ZERO: Vec = (0.0, 0.0, 0.0)


def _v(x) -> Vec:
    a = np.asarray(x, dtype=np.float64).reshape(3)
    return (float(a[0]), float(a[1]), float(a[2]))


@dataclass(frozen=True)
class MaterialSpec:
    """POD material spec (src/util/MaterialSpec.h:7-40)."""

    emission: Vec = _ZERO
    diffuse: Vec = _ZERO
    index_of_refraction: float = 1.0
    reflectivity: float = -1.0  # < 0 => use Fresnel reflectance
    reflection_cone_angle_radians: float = 0.0

    @staticmethod
    def to_radians(angle_degrees: float) -> float:
        return angle_degrees / 360.0 * 2.0 * math.pi

    @staticmethod
    def make_diffuse(colour) -> "MaterialSpec":
        return MaterialSpec(diffuse=_v(colour))

    @staticmethod
    def make_specular(colour, index: float) -> "MaterialSpec":
        return MaterialSpec(diffuse=_v(colour), index_of_refraction=index)

    @staticmethod
    def make_light(colour) -> "MaterialSpec":
        return MaterialSpec(emission=_v(colour))

    @staticmethod
    def make_glossy(colour, index: float, cone_angle_degrees: float) -> "MaterialSpec":
        return MaterialSpec(
            diffuse=_v(colour),
            index_of_refraction=index,
            reflectivity=-1.0,
            reflection_cone_angle_radians=MaterialSpec.to_radians(cone_angle_degrees),
        )

    @staticmethod
    def make_reflective(
        colour, reflectivity: float, cone_angle_degrees: float
    ) -> "MaterialSpec":
        return MaterialSpec(
            diffuse=_v(colour),
            index_of_refraction=1.0,
            reflectivity=reflectivity,
            reflection_cone_angle_radians=MaterialSpec.to_radians(cone_angle_degrees),
        )

    def replace(self, **kw) -> "MaterialSpec":
        from dataclasses import replace as _replace

        return _replace(self, **kw)


class MaterialTable(NamedTuple):
    """Deduplicated SoA material table on device.

    Differentiable leaves: ``emission``, ``diffuse``, ``reflectivity``,
    ``cone_angle``, ``ior`` — these are the parameters path-replay backprop
    differentiates w.r.t.
    """

    emission: jnp.ndarray  # [M, 3]
    diffuse: jnp.ndarray  # [M, 3]
    ior: jnp.ndarray  # [M]
    reflectivity: jnp.ndarray  # [M] (<0 => Fresnel)
    cone_angle: jnp.ndarray  # [M]


@dataclass
class MaterialInterner:
    """Host-side dedupe of MaterialSpec -> small integer ids."""

    specs: list = field(default_factory=list)
    _index: dict = field(default_factory=dict)

    def intern(self, spec: MaterialSpec) -> int:
        key = spec
        idx = self._index.get(key)
        if idx is None:
            idx = len(self.specs)
            self.specs.append(spec)
            self._index[key] = idx
        return idx

    def build(self, dtype=jnp.float32) -> MaterialTable:
        specs = self.specs if self.specs else [MaterialSpec()]
        emission = np.array([s.emission for s in specs], dtype=np.float64)
        diffuse = np.array([s.diffuse for s in specs], dtype=np.float64)
        ior = np.array([s.index_of_refraction for s in specs], dtype=np.float64)
        refl = np.array([s.reflectivity for s in specs], dtype=np.float64)
        cone = np.array(
            [s.reflection_cone_angle_radians for s in specs], dtype=np.float64
        )
        return MaterialTable(
            emission=jnp.asarray(emission, dtype),
            diffuse=jnp.asarray(diffuse, dtype),
            ior=jnp.asarray(ior, dtype),
            reflectivity=jnp.asarray(refl, dtype),
            cone_angle=jnp.asarray(cone, dtype),
        )
