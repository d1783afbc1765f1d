"""Framebuffer tests (reference: test/util/ArrayOutputTests.cpp) plus the
raw-format merge contract (raw_to_png.cpp)."""

import numpy as np
import pytest

from pt_three_ways_tpu.utils.framebuffer import ArrayOutput, merge, srgb8
from pt_three_ways_tpu.utils.png import read_png, write_png


class TestAccumulation:
    def test_add_samples_and_mean(self):
        a = ArrayOutput(4, 2)
        a.add_samples(1, 0, (1.0, 2.0, 3.0), 1)
        a.add_samples(1, 0, (3.0, 2.0, 1.0), 1)
        np.testing.assert_allclose(a.raw_pixel_at(1, 0), [2, 2, 2])
        assert a.total_samples() == 2

    def test_gamma_pixel(self):
        a = ArrayOutput(1, 1)
        a.add_samples(0, 0, (0.5, 1.5, 0.0), 1)
        px = a.pixel_at(0, 0)
        # clamp, gamma 2.2, round (ArrayOutput.cpp:8-12)
        assert px[0] == int(np.floor(0.5 ** (1 / 2.2) * 255 + 0.5))
        assert px[1] == 255
        assert px[2] == 0

    def test_merge_exactness(self):
        a = ArrayOutput(3, 3)
        b = ArrayOutput(3, 3)
        a.add_samples(0, 0, (1, 1, 1), 2)
        b.add_samples(0, 0, (2, 0, 0), 1)
        m = merge([a, b])
        np.testing.assert_allclose(m.raw_pixel_at(0, 0), [1.0, 1 / 3, 1 / 3])
        assert m.total_samples() == 3

    def test_size_mismatch(self):
        a = ArrayOutput(2, 2)
        b = ArrayOutput(3, 2)
        with pytest.raises(ValueError):
            a += b


class TestRawFormat:
    def test_round_trip_bit_exact(self, tmp_path, rng_np):
        a = ArrayOutput(5, 3)
        a.sum[:] = rng_np.normal(size=(3, 5, 3))
        a.count[:] = rng_np.integers(0, 100, size=(3, 5))
        path = str(tmp_path / "x.raw")
        a.save(path)
        b = ArrayOutput.load(path)
        np.testing.assert_array_equal(a.sum, b.sum)
        np.testing.assert_array_equal(a.count, b.count)

    def test_format_layout_matches_reference(self, tmp_path):
        # header {sig=1, ver=1, h, w} uint32 LE + per pixel 3xf64 + uint32
        a = ArrayOutput(2, 1)
        a.add_samples(0, 0, (1.5, 2.5, 3.5), 7)
        path = str(tmp_path / "x.raw")
        a.save(path)
        blob = open(path, "rb").read()
        assert len(blob) == 16 + 2 * (24 + 4)
        header = np.frombuffer(blob[:16], np.uint32)
        np.testing.assert_array_equal(header, [1, 1, 1, 2])
        np.testing.assert_array_equal(
            np.frombuffer(blob[16:40], np.float64), [1.5, 2.5, 3.5]
        )
        assert np.frombuffer(blob[40:44], np.uint32)[0] == 7

    def test_bad_signature(self, tmp_path):
        path = str(tmp_path / "bad.raw")
        with open(path, "wb") as f:
            f.write(b"\x02\x00\x00\x00" + b"\x01\x00\x00\x00" * 3)
        with pytest.raises(IOError, match="bad signature"):
            ArrayOutput.load(path)

    def test_bad_version(self, tmp_path):
        path = str(tmp_path / "bad.raw")
        with open(path, "wb") as f:
            f.write(b"\x01\x00\x00\x00\x09\x00\x00\x00" + b"\x01\x00\x00\x00" * 2)
        with pytest.raises(IOError, match="bad version"):
            ArrayOutput.load(path)


class TestPng:
    def test_round_trip(self, tmp_path, rng_np):
        img = rng_np.integers(0, 256, size=(7, 5, 3)).astype(np.uint8)
        path = str(tmp_path / "x.png")
        write_png(path, img)
        back = read_png(path)
        np.testing.assert_array_equal(img, back)

    def test_srgb8_vector(self):
        np.testing.assert_array_equal(
            srgb8(np.array([0.0, 1.0, 2.0])), [0, 255, 255]
        )
