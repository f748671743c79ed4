"""Structured metrics logging + step timing.

Reference parity: the Keras progress bar + TensorBoard scalars written by
trainer.py's TensorBoard callback (SURVEY.md §5 "Metrics"). Here: a JSONL
scalar writer (TensorBoard-compatible tags, trivially greppable offline)
plus a throughput/step-time tracker with percentiles — BASELINE.md asks
for images/sec/chip and p50 latency, which the reference never measured.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class MetricsLogger:
    """Append-only JSONL scalar log, optionally mirrored to TensorBoard.

    The JSONL file is the source of truth (greppable offline); when
    TensorFlow is importable and `tensorboard=True`, scalars are also
    written as tf.summary events so the reference's TensorBoard workflow
    (trainer.py's TensorBoard callback) carries over unchanged.
    """

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = "") -> None:
        # Scalars first, bookkeeping last: a scalar named "step"/"time"
        # under an empty prefix must not clobber the record's step index
        # or wall-clock timestamp (offline tooling greps them).
        rec = {f"{prefix}{k}": float(v) for k, v in scalars.items()}
        rec["step"] = int(step)
        rec["time"] = time.time()
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(f"{prefix}{k}", float(v),
                                      step=int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock step timing with percentile summaries.

    Call `tick()` around each step (after block_until_ready); first
    `skip` ticks are treated as compile/warmup and excluded.
    """

    def __init__(self, skip: int = 2):
        self.skip = skip
        self._times: List[float] = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self._times.append(dt)
        return dt

    @property
    def measured(self) -> List[float]:
        return self._times[self.skip:]

    def summary(self, items_per_step: Optional[int] = None) -> Dict[str, float]:
        ts = np.asarray(self.measured)
        if ts.size == 0:
            return {}
        out = {
            "steps": int(ts.size),
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p90_s": float(np.percentile(ts, 90)),
            "p99_s": float(np.percentile(ts, 99)),
        }
        if items_per_step:
            # Throughput from TOTAL wall-clock, not the p50: per-step
            # block_until_ready timings over the axon tunnel can read
            # physics-violating sub-ms values (CLAUDE.md), and a p50 of
            # those prints fantasy img/s. The sum of tick intervals IS
            # the measured window's wall-clock, robust to any per-tick
            # weirdness.
            out["items_per_sec"] = items_per_step * ts.size / float(ts.sum())
        return out
