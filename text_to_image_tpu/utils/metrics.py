"""Metric writer (rebuild of the reference's tf.summary/FileWriter — SURVEY
§5.5) plus a steady-state throughput meter, since images/sec/chip is the
framework's north-star metric.

Metrics land as JSON-lines (one dict per write) — trivially plottable and
diffable — and, in parallel, as TensorBoard event files via the pure-Python
encoder in ``utils/tensorboard.py`` (matching the reference's FileWriter
output without a TF dependency).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


class MetricWriter:
    def __init__(self, log_dir: str, name: str = "train",
                 also_print: bool = True, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{name}.jsonl")
        self._f = open(self._path, "a")
        self._print = also_print
        self._tb = None
        if tensorboard:
            from text_to_image_tpu.utils.tensorboard import TBEventWriter
            self._tb = TBEventWriter(log_dir)

    def write(self, step: int, metrics: Dict) -> None:
        rec = {"step": int(step)}
        for k, v in metrics.items():
            rec[k] = float(jax.device_get(v)) if hasattr(v, "dtype") else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, rec["step"])
            self._tb.flush()
        if self._print:
            body = " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                            for k, v in rec.items() if k != "step")
            print(f"[step {rec['step']}] {body}")

    def write_image(self, step: int, tag: str, image: np.ndarray) -> None:
        """Log a uint8 [H, W, C] image summary (sample grids)."""
        if self._tb is not None:
            self._tb.add_image(tag, image, int(step))
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def hbm_stats() -> Dict[str, float]:
    """Device memory stats in GiB (empty dict if the backend has none)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        gib = 1024**3
        out = {}
        if "bytes_in_use" in stats:
            out["hbm_in_use_gib"] = round(stats["bytes_in_use"] / gib, 3)
        if "peak_bytes_in_use" in stats:
            out["hbm_peak_gib"] = round(stats["peak_bytes_in_use"] / gib, 3)
        return out
    except Exception:
        return {}


class ThroughputMeter:
    """Images/sec over a sliding window of recent ticks, excluding the first
    (compile) step — a cumulative-since-start average would forever drag in
    early stalls (compiles, cold summaries)."""

    WINDOW = 200

    def __init__(self, images_per_step: int):
        import collections
        self.images_per_step = images_per_step
        self._ticks: "collections.deque[float]" = collections.deque(
            maxlen=self.WINDOW)

    def tick(self) -> Optional[float]:
        self._ticks.append(time.perf_counter())
        if len(self._ticks) < 2:    # first tick (post-compile) opens window
            return None
        dt = self._ticks[-1] - self._ticks[0]
        return (self.images_per_step * (len(self._ticks) - 1) / dt
                if dt > 0 else None)

    def reset(self):
        self._ticks.clear()
