"""Colormap helpers for depth/disparity and normal visualization.

Behavioral parity with the reference's ``vis_disp_colormap``
(code/utils/utils_misc.py:9-32): min/scale normalization restricted to a
validity mask, optional reuse of a previously computed (min, scale) pair so
est/gt panels share a range, matplotlib colormap lookup, uint8 RGB output.
"""

from __future__ import annotations

import numpy as np


def _cmap_lut(name: str, n: int = 256) -> np.ndarray:
    """(n, 3) float LUT for a matplotlib colormap, small fallback otherwise."""
    try:
        import matplotlib

        cm = matplotlib.colormaps[name]
        return np.asarray(cm(np.linspace(0.0, 1.0, n))[:, :3], dtype=np.float32)
    except Exception:
        # linear gray fallback keeps viz functional without matplotlib
        g = np.linspace(0.0, 1.0, n, dtype=np.float32)
        return np.stack([g, g, g], axis=-1)


def disp_colormap(
    arr: np.ndarray,
    normalize: bool = True,
    min_and_scale=None,
    valid_mask: np.ndarray | None = None,
    cmap_name: str = "jet",
):
    """(H, W) scalar map -> ((H, W, 3) uint8 RGB, [min, scale]).

    ``min_and_scale`` lets a second call (e.g. the GT panel) reuse the
    est panel's normalization so colors are comparable.
    """
    a = np.array(arr, dtype=np.float64, copy=True)
    if valid_mask is None:
        valid_mask = np.ones_like(a, dtype=bool)
    else:
        valid_mask = valid_mask.astype(bool)
        if not valid_mask.any():
            valid_mask = np.ones_like(a, dtype=bool)

    if normalize:
        if min_and_scale is None:
            lo = float(np.amin(a[valid_mask]))
            a -= lo
            scale = 1.0 / (1e-6 + float(np.amax(a[valid_mask])))
            a *= scale
            min_and_scale = [lo, scale]
        else:
            a = (a - min_and_scale[0]) * min_and_scale[1]

    a = np.clip(a, 0.0, 1.0)
    lut = _cmap_lut(cmap_name)
    idx = np.clip((a * (len(lut) - 1)).astype(np.int32), 0, len(lut) - 1)
    rgb = (lut[idx] * 255.0).astype(np.uint8)
    return rgb, min_and_scale


def normal_to_rgb(normal: np.ndarray) -> np.ndarray:
    """(..., 3) normals in [-1, 1] -> uint8 RGB ((n+1)/2 convention)."""
    return (np.clip((np.asarray(normal) + 1.0) / 2.0, 0.0, 1.0) * 255.0).astype(
        np.uint8
    )
