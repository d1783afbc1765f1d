"""Wavefront OBJ + MTL loader -> duck-typed scene builder.

Same contract and semantics as the reference loader
(src/util/ObjLoader.{h,cpp}, ObjLoaderImpl.h):

  * tokenizer: whitespace-separated fields, '#' starts a comment that
    swallows the rest of the line (ObjLoaderImpl.h:20-21, 30-40);
  * unknown directives raise with the 1-based line number
    (ObjLoaderImpl.h:44-48);
  * 'v' takes exactly 3 params; 'f' fan-decimates n-gons and supports
    negative (relative) indices (ObjLoaderImpl.h:66-80, ObjLoader.cpp:14-17);
  * 'g'/'o'/'s' ignored; 'usemtl' must name a known material; 'mtllib'
    resolves through an injected opener (ObjLoader.h:9-12);
  * MTL: newmtl/Ke/Kd/Ka/Ni/Ns/illum handled, Ks/d ignored, anything else
    raises. Ns maps to a cone angle via the reference's empirical hack
    pi * clamp(1 - Ns/100, 0, 1) (ObjLoader.cpp:91-97); 'illum 3' sets
    reflectivity = |Ka| when the material is flushed (ObjLoader.cpp:36-40).
    Note the reference keeps ``illum`` and the ambient colour across
    materials within one file (they are only overwritten, never reset) —
    replicated here because rendered images depend on it.

The loader is duck-typed over the builder (needs add_triangle / add_sphere /
set_environment_colour), so StatsSceneBuilder and test fakes work unchanged.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Iterable, List, TextIO

import numpy as np

from ..models.materials import MaterialSpec


class ObjLoaderOpener:
    """Abstract opener for mtllib includes (src/util/ObjLoader.h:9-12)."""

    def open(self, filename: str) -> TextIO:
        raise NotImplementedError


class DirRelativeOpener(ObjLoaderOpener):
    """Opens files relative to a directory (src/main/main.cpp:27-38)."""

    def __init__(self, directory: str):
        self.directory = directory

    def open(self, filename: str) -> TextIO:
        import os

        fullname = os.path.join(self.directory, filename)
        try:
            return open(fullname, "r")
        except OSError as e:
            raise IOError(f"Unable to open {fullname}") from e


def _parse(stream: Iterable[str], handler: Callable) -> None:
    """Line tokenizer + dispatch (ObjLoaderImpl.h:24-50)."""
    for line_number, raw_line in enumerate(stream, start=1):
        line = raw_line.rstrip("\r\n")
        hash_pos = line.find("#")
        if hash_pos >= 0:
            line = line[:hash_pos]
        fields = line.split()
        if not fields:
            continue
        command, params = fields[0], fields[1:]
        if not handler(command, params):
            raise ValueError(
                f"Unknown directive '{command}' on line {line_number}"
            )


def _as_index(token: str, count: int) -> int:
    """OBJ 1-based / negative-relative index (ObjLoader.cpp:14-17).

    Face tokens may carry texture/normal fields ("1/2/3", "1//2"); like the
    reference's std::stol only the leading integer is parsed.
    """
    value = int(token.split("/", 1)[0])
    return value + count if value < 0 else value - 1


class _MutableMat:
    __slots__ = ("emission", "diffuse", "ior", "reflectivity", "cone")

    def __init__(self):
        self.emission = (0.0, 0.0, 0.0)
        self.diffuse = (0.0, 0.0, 0.0)
        self.ior = 1.0
        self.reflectivity = -1.0
        self.cone = 0.0

    def freeze(self) -> MaterialSpec:
        return MaterialSpec(
            emission=self.emission,
            diffuse=self.diffuse,
            index_of_refraction=self.ior,
            reflectivity=self.reflectivity,
            reflection_cone_angle_radians=self.cone,
        )


def load_materials(stream: Iterable[str]) -> Dict[str, MaterialSpec]:
    """MTL parser (src/util/ObjLoader.cpp:20-108)."""
    result: Dict[str, _MutableMat] = {}
    state = {"cur": None, "name": None, "illum": 2, "ambient": (0.0, 0.0, 0.0)}

    def flush():
        cur = state["cur"]
        if cur is None:
            return
        if state["illum"] == 3:
            cur.reflectivity = float(np.linalg.norm(state["ambient"]))
        state["cur"] = None

    def need(cur):
        if cur is None:
            raise ValueError("Unexpected directive before newmtl")
        return cur

    def vec3(params):
        if len(params) != 3:
            raise ValueError("Wrong number of params")
        return (float(params[0]), float(params[1]), float(params[2]))

    def handler(command: str, params: List[str]) -> bool:
        if command == "newmtl":
            flush()
            if len(params) != 1:
                raise ValueError("Wrong number of params for newmtl")
            mat = _MutableMat()
            result[params[0]] = mat
            state["cur"] = mat
            return True
        if command == "Ke":
            need(state["cur"]).emission = vec3(params)
            return True
        if command == "Kd":
            need(state["cur"]).diffuse = vec3(params)
            return True
        if command == "Ka":
            need(state["cur"])
            state["ambient"] = vec3(params)
            return True
        if command == "Ni":
            need(state["cur"]).ior = float(params[0])
            return True
        if command == "Ns":
            # Empirical highlight->cone-angle hack (ObjLoader.cpp:91-97).
            val = float(params[0]) / 100.0
            need(state["cur"]).cone = math.pi * min(max(1.0 - val, 0.0), 1.0)
            return True
        if command == "illum":
            need(state["cur"])
            state["illum"] = int(params[0])
            return True
        if command in ("Ks", "d"):
            return True
        return False

    _parse(stream, handler)
    flush()
    return {name: mat.freeze() for name, mat in result.items()}


def load_obj_file(stream: Iterable[str], opener: ObjLoaderOpener, builder) -> None:
    """OBJ parser driving a duck-typed builder (ObjLoaderImpl.h:57-105)."""
    vertices: List[np.ndarray] = []
    materials: Dict[str, MaterialSpec] = {}
    cur_mat = MaterialSpec()

    def handler(command: str, params: List[str]) -> bool:
        nonlocal cur_mat, materials
        if command == "v":
            if len(params) != 3:
                raise ValueError("Wrong number of params for v")
            vertices.append(
                np.array(
                    [float(params[0]), float(params[1]), float(params[2])]
                )
            )
            return True
        if command == "f":
            indices = [_as_index(p, len(vertices)) for p in params]
            for i in range(1, len(params) - 1):
                builder.add_triangle(
                    vertices[indices[0]],
                    vertices[indices[i]],
                    vertices[indices[i + 1]],
                    cur_mat,
                )
            return True
        if command in ("g", "o", "s"):
            return True
        if command == "usemtl":
            name = params[0]
            if name not in materials:
                raise ValueError(f"Can't find material {name}")
            cur_mat = materials[name]
            return True
        if command == "mtllib":
            with opener.open(params[0]) as mat_file:
                materials = load_materials(mat_file)
            return True
        return False

    _parse(stream, handler)
