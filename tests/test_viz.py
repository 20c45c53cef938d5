"""Visualization subsystem tests (viz/colormap.py, viz/plots.py, viz/tb.py)."""

import os

import numpy as np
import pytest

from monosdf_tpu.viz import disp_colormap, normal_to_rgb, get_plot_data, plot, lin2img
from monosdf_tpu.viz.plots import backproject_colored_points
from monosdf_tpu.viz.tb import MetricsWriter
from monosdf_tpu.meshing.ply import write_ply, read_ply


class TestColormap:
    def test_range_and_shape(self):
        a = np.linspace(0, 10, 64).reshape(8, 8)
        rgb, ms = disp_colormap(a)
        assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
        assert ms[0] == 0.0 and ms[1] == pytest.approx(0.1, rel=1e-4)

    def test_shared_min_and_scale(self):
        a = np.linspace(0, 10, 64).reshape(8, 8)
        _, ms = disp_colormap(a)
        rgb2, ms2 = disp_colormap(a * 0.5, min_and_scale=ms)
        assert ms2 is ms  # reused, not recomputed

    def test_valid_mask_restricts_normalization(self):
        a = np.ones((4, 4))
        a[0, 0] = 100.0  # outlier excluded by mask
        mask = np.ones((4, 4), bool)
        mask[0, 0] = False
        _, ms = disp_colormap(a, valid_mask=mask)
        assert ms[0] == 1.0  # min over valid region only

    def test_normal_to_rgb(self):
        n = np.array([[[-1.0, 0.0, 1.0]]])
        rgb = normal_to_rgb(n)
        assert rgb[0, 0, 0] == 0 and rgb[0, 0, 2] == 255


class TestBackproject:
    def test_center_pixel_on_axis(self):
        H = W = 4
        K = np.array([[10.0, 0, 2.0], [0, 10.0, 2.0], [0, 0, 1]])
        depth = np.full((H, W), 2.0)
        pts = backproject_colored_points(depth, K)
        assert pts.shape == (16, 3)
        np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-6)
        # pixel (2,2) has center offset (0.5, 0.5)/10*2 from axis
        np.testing.assert_allclose(pts[2 * W + 2, :2], [0.1, 0.1], atol=1e-6)


class TestPlot:
    def _fake(self, H=6, W=8):
        n = H * W
        rng = np.random.default_rng(0)
        render_out = {
            "rgb": rng.uniform(0, 1, (n, 3)),
            "depth": rng.uniform(0.5, 2.0, (n, 1)),
            "normal": rng.uniform(-1, 1, (n, 3)),
        }
        image = {
            "gt": {
                "rgb": rng.uniform(0, 1, (n, 3)),
                "depth": rng.uniform(0, 1, (n, 1)),
                "normal": rng.uniform(-1, 1, (n, 3)),
                "mask": np.ones((n, 1), np.float32),
            },
            "frame_idx": 3,
            "intrinsics": np.array([[10.0, 0, 4], [0, 10.0, 3], [0, 0, 1]]),
            "img_res": (H, W),
        }
        return render_out, image

    def test_get_plot_data_aligns_depth(self):
        render_out, image = self._fake()
        data = get_plot_data(render_out, image, image["img_res"])
        assert data["rgb_eval"].shape == (6, 8, 3)
        assert data["depth_map"].shape == (6, 8)
        # scale/shift alignment makes the mean error small vs unaligned
        err = np.abs(data["depth_map"] - data["depth_gt"]).mean()
        raw = np.abs(
            np.asarray(render_out["depth"]).reshape(6, 8) - data["depth_gt"]
        ).mean()
        assert err < raw
        assert data["pred_points"].shape == (48, 6)

    def test_plot_writes_panels(self, tmp_path):
        pytest.importorskip("cv2")
        render_out, image = self._fake()
        data = get_plot_data(render_out, image, image["img_res"])
        files = plot(data, str(tmp_path), epoch=2, img_res=image["img_res"],
                     frame_idx=3, prefix="VAL_")
        for f in files:
            assert os.path.exists(f)
        assert os.path.exists(tmp_path / "VAL_merge_2_3.png")
        assert os.path.exists(tmp_path / "VAL_pred_points_2_3.ply")
        import cv2

        img = cv2.imread(str(tmp_path / "VAL_rendering_2_3.png"))
        assert img.shape == (6, 16, 3)  # est|gt side by side


class TestPlyColors:
    def test_roundtrip_with_colors(self, tmp_path):
        verts = np.random.default_rng(0).uniform(-1, 1, (10, 3)).astype(np.float32)
        colors = np.random.default_rng(1).uniform(0, 1, (10, 3))
        p = str(tmp_path / "c.ply")
        write_ply(p, verts, colors=colors)
        v, f = read_ply(p)
        np.testing.assert_allclose(v, verts, atol=1e-6)
        assert f is None


class TestMetricsWriter:
    def test_fallback_and_scalars(self, tmp_path):
        w = MetricsWriter(str(tmp_path))
        w.scalars({"loss": 1.0, "psnr": 20.0}, step=5, prefix="train/")
        w.image("x", np.zeros((4, 4, 3), np.uint8), 5)
        w.flush()
        w.close()
        # either a TB event file or the jsonl fallback must exist
        files = os.listdir(tmp_path)
        assert files
