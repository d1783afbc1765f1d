"""Accumulation framebuffer + the reference-compatible ``.raw`` checkpoint.

Mirrors ArrayOutput/SampledPixel (src/util/ArrayOutput.{h,cpp},
src/util/SampledPixel.{h,cpp}): pixels store (sum, count) — NOT averages — so
accumulation is associative and merging partial renders (across passes,
devices, hosts, or separate runs) is exact (ArrayOutput.cpp:48-57).

The binary format is bit-compatible with the reference's checkpoint
(ArrayOutput.cpp:20-28, 66-110): little-endian header
{uint32 signature=1, uint32 version=1, uint32 height, uint32 width} followed
by row-major per-pixel {3 x float64 sum, uint32 count}. Files written by the
C++ binary and by this module are interchangeable, which preserves the
reference's offline multi-run merge story (raw_to_png.cpp:41-80).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

_HEADER = struct.Struct("<IIII")
_SIGNATURE = 1
_VERSION = 1

_PIXEL_DTYPE = np.dtype(
    [("sum", "<f8", (3,)), ("count", "<u4")], align=False
)


def srgb8(component: np.ndarray) -> np.ndarray:
    """Gamma-2.2 8-bit mapping: lround(clamp(x,0,1)^(1/2.2) * 255)
    (ArrayOutput.cpp:8-12)."""
    x = np.clip(component, 0.0, 1.0) ** (1.0 / 2.2) * 255.0
    return np.floor(x + 0.5).astype(np.uint8)


class ArrayOutput:
    """W x H framebuffer of (sum, count) pixels (ArrayOutput.h:9-53)."""

    def __init__(self, width: int, height: int):
        self._width = int(width)
        self._height = int(height)
        self.sum = np.zeros((self._height, self._width, 3), dtype=np.float64)
        self.count = np.zeros((self._height, self._width), dtype=np.uint64)

    @property
    def width(self) -> int:
        return self._width

    @property
    def height(self) -> int:
        return self._height

    def add_samples(self, x: int, y: int, colour, num_samples: int) -> None:
        """Per-pixel accumulate (ArrayOutput.cpp:38-41)."""
        self.sum[y, x] += np.asarray(colour, np.float64)
        self.count[y, x] += num_samples

    def add_pass(self, colour_sum: np.ndarray, samples_per_pixel: int = 1) -> None:
        """Whole-frame accumulate of a [H, W, 3] radiance sum (device pass)."""
        self.sum += np.asarray(colour_sum, np.float64)
        self.count += samples_per_pixel

    def raw_pixel_at(self, x: int, y: int) -> np.ndarray:
        c = self.count[y, x]
        return self.sum[y, x] / c if c else np.zeros(3)

    def pixel_at(self, x: int, y: int) -> np.ndarray:
        return srgb8(self.raw_pixel_at(x, y))

    def mean(self) -> np.ndarray:
        """[H, W, 3] linear mean (count-0 pixels are black)."""
        c = np.maximum(self.count, 1)[..., None].astype(np.float64)
        return np.where(self.count[..., None] > 0, self.sum / c, 0.0)

    def to_srgb8(self) -> np.ndarray:
        return srgb8(self.mean())

    def total_samples(self) -> int:
        return int(self.count.sum())

    def __iadd__(self, rhs: "ArrayOutput") -> "ArrayOutput":
        if (rhs.width, rhs.height) != (self.width, self.height):
            raise ValueError(
                "Two differently-sized arrays were attempted to be combined"
            )
        self.sum += rhs.sum
        self.count += rhs.count
        return self

    # --- reference-compatible binary checkpoint (ArrayOutput.cpp:66-110) ---

    def save(self, filename: str) -> None:
        pixels = np.empty(self._height * self._width, dtype=_PIXEL_DTYPE)
        pixels["sum"] = self.sum.reshape(-1, 3)
        if (self.count > 0xFFFFFFFF).any():
            raise OverflowError("sample count exceeds uint32 raw format")
        pixels["count"] = self.count.reshape(-1).astype(np.uint32)
        with open(filename, "wb") as f:
            f.write(_HEADER.pack(_SIGNATURE, _VERSION, self._height, self._width))
            f.write(pixels.tobytes())

    @staticmethod
    def from_mean(mean: np.ndarray, samples_per_pixel: int) -> "ArrayOutput":
        """Wrap a [H, W, 3] linear mean image as a (sum, count) framebuffer."""
        mean = np.asarray(mean, np.float64)
        out = ArrayOutput(mean.shape[1], mean.shape[0])
        out.sum[:] = mean * samples_per_pixel
        out.count[:] = samples_per_pixel
        return out

    @staticmethod
    def load(filename: str) -> "ArrayOutput":
        with open(filename, "rb") as f:
            header = f.read(_HEADER.size)
            if len(header) != _HEADER.size:
                raise IOError(f"Unable to read from {filename}")
            signature, version, height, width = _HEADER.unpack(header)
            if signature != _SIGNATURE:
                raise IOError(f"Bad file {filename} : bad signature")
            if version != _VERSION:
                raise IOError(f"Bad file {filename} : bad version")
            data = f.read(height * width * _PIXEL_DTYPE.itemsize)
        pixels = np.frombuffer(data, dtype=_PIXEL_DTYPE)
        if pixels.shape[0] != height * width:
            raise IOError(f"Unable to read from {filename}")
        out = ArrayOutput(width, height)
        out.sum[:] = pixels["sum"].reshape(height, width, 3)
        out.count[:] = pixels["count"].reshape(height, width)
        return out


def merge(outputs) -> ArrayOutput:
    """Exact multi-run merge (raw_to_png.cpp:41-63)."""
    outputs = list(outputs)
    if not outputs:
        raise ValueError("nothing to merge")
    acc = ArrayOutput(outputs[0].width, outputs[0].height)
    for o in outputs:
        acc += o
    return acc
