"""Training observability (SURVEY.md §5.5).

Role of the reference's TensorBoard logging in training_report
(reference: train_baseline.py:153-197 — per-iter loss scalars, eval PSNR/L1
on train+test cameras, opacity histogram, total_points) without requiring a
TensorBoard install: scalars always stream to `<model_path>/metrics.jsonl`
(one JSON object per line), and mirror to TensorBoard when
`torch.utils.tensorboard` is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, model_path: str, enable_tensorboard: bool = True):
        self.path = os.path.join(model_path, "metrics.jsonl")
        os.makedirs(model_path, exist_ok=True)
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(model_path, "tb"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            key = f"{prefix}{k}"
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._f.write(json.dumps(rec) + "\n")

    def histogram(self, step: int, name: str, values) -> None:
        arr = np.asarray(values).ravel()
        if self._tb is not None:
            self._tb.add_histogram(name, arr, int(step))
        self._f.write(
            json.dumps(
                {
                    "step": int(step),
                    f"{name}/mean": float(arr.mean()) if arr.size else 0.0,
                    f"{name}/min": float(arr.min()) if arr.size else 0.0,
                    f"{name}/max": float(arr.max()) if arr.size else 0.0,
                }
            )
            + "\n"
        )

    def images(self, step: int, name: str, images) -> None:
        """images: (N, 3, H, W) in [0, 1]; TB-only (jsonl records the event)."""
        if self._tb is not None:
            arr = np.clip(np.asarray(images), 0.0, 1.0)
            self._tb.add_images(name, arr, int(step))
        self._f.write(json.dumps({"step": int(step), "images": name}) + "\n")

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def maybe_profiler_trace(profile_dir: Optional[str], start: bool):
    """jax.profiler trace window (SURVEY.md §5.1: the reference creates cuda
    timing events but never records them; here tracing is a real flag)."""
    import jax

    if not profile_dir:
        return
    if start:
        jax.profiler.start_trace(profile_dir)
    else:
        jax.profiler.stop_trace()
