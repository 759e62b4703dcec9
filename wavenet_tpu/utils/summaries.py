"""Metrics/observability sink.

The reference logged through tf.summary scalars + histograms into
TensorBoard event files (reference: model.py ≈:722-738, train.py ≈:258).
Here the primary sink is a plain ``metrics.jsonl`` (greppable, no TF
dependency); when TensorFlow happens to be importable we ALSO write real
TensorBoard event files so existing dashboards keep working.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class SummaryWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a",
                           buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # optional
                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.scalar(tag, value, step=step)

    def histogram(self, tag: str, values: np.ndarray, step: int) -> None:
        values = np.asarray(values).ravel()
        self._jsonl.write(json.dumps(
            {"tag": tag, "step": int(step), "ts": time.time(),
             "histogram": {
                 "min": float(values.min()), "max": float(values.max()),
                 "mean": float(values.mean()), "std": float(values.std()),
                 "count": int(values.size)}}) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.histogram(tag, values, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
