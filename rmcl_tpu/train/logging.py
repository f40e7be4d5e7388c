"""Observability: metric logging + profiler tracing.

Reference (SURVEY.md §5.1, §5.5): TensorBoardLogger + LearningRateMonitor
+ tqdm.  Here:
  * MetricLogger — JSONL metrics file (always) + TensorBoard events when
    a writer backend is importable; rank-0 only.
  * profile_steps — jax.profiler trace of a step window, the TPU
    substitute for the reference's (absent) profiling story.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled
        self.logdir = logdir
        self._tb = None
        self._fp = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self._fp = open(os.path.join(logdir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = ""):
        if not self.enabled:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[prefix + k] = float(np.asarray(v))
            except (TypeError, ValueError):
                continue
        rec = {"step": int(step), "time": time.time(), **clean}
        self._fp.write(json.dumps(rec) + "\n")
        self._fp.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        if self._fp:
            self._fp.close()
        if self._tb is not None:
            self._tb.close()


@contextmanager
def profile_steps(logdir: str, enabled: bool = True):
    """jax.profiler trace window: wrap a few train steps to get a
    TensorBoard-viewable TPU trace (op timeline, HBM, MXU utilization)."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
