"""Metrics/observability writer.

Mirrors the reference's rank-0 TensorBoard ``SummaryWriter`` under
``plots/logs`` (monosdf_train.py:303-304, 458-475): scalar loss components,
beta/alpha, PSNR, per-group LRs, plus image dashboards. Falls back to a
JSONL scalar log when tensorboard isn't importable, so observability never
silently disappears on a lean TPU host image.
"""

from __future__ import annotations

import json
import os


class MetricsWriter:
    def __init__(self, log_dir: str, enabled: bool = True):
        self.log_dir = log_dir
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        elif self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n"
            )

    def scalars(self, metrics: dict, step: int, prefix: str = ""):
        for k, v in metrics.items():
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass
        if self._jsonl is not None:
            self._jsonl.flush()

    def image(self, tag: str, img, step: int):
        """img: (H, W, 3) uint8 or (H, W) uint8/float."""
        if self._tb is None:
            return
        fmt = "HWC" if getattr(img, "ndim", 3) == 3 else "HW"
        self._tb.add_image(tag, img, step, dataformats=fmt)

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
