"""Native EXR reader/writer tests (the HDR on-disk path)."""

import numpy as np
import pytest

from monosdf_tpu.data.exr import read_exr, write_exr, _predict, _unpredict


class TestPredictor:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, 1001, dtype=np.uint8)
        np.testing.assert_array_equal(_unpredict(_predict(raw)), raw)


class TestExrRoundtrip:
    def test_uncompressed(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 12.0, (17, 23, 3)).astype(np.float32)  # HDR range
        p = str(tmp_path / "t.exr")
        write_exr(p, img)
        out = read_exr(p)
        assert out.shape == (17, 23, 3)
        np.testing.assert_allclose(out, img, rtol=1e-7)

    def test_zips_compressed(self, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 4.0, (9, 33, 3)).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img, compression="zips")
        out = read_exr(p)
        np.testing.assert_allclose(out, img, rtol=1e-7)

    def test_channel_order_rgb(self, tmp_path):
        img = np.zeros((2, 2, 3), np.float32)
        img[..., 0] = 1.0  # R
        img[..., 2] = 3.0  # B
        p = str(tmp_path / "t.exr")
        write_exr(p, img)  # stored alphabetically (B, G, R)
        out = read_exr(p)
        assert out[0, 0, 0] == 1.0 and out[0, 0, 2] == 3.0


class TestDatasetHdrPath:
    def test_load_rgb_exr_fallback(self, tmp_path):
        from monosdf_tpu.data.scene_dataset import _load_rgb

        rng = np.random.default_rng(3)
        img = rng.uniform(0, 8.0, (6, 5, 3)).astype(np.float32)
        p = str(tmp_path / "img.exr")
        write_exr(p, img)
        flat = _load_rgb(p, if_hdr=True)
        assert flat.shape == (30, 3)
        np.testing.assert_allclose(flat.reshape(6, 5, 3), img, rtol=1e-6)
