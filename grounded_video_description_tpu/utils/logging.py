"""Metrics logging + profiling.

Replaces the reference's stdout prints / visdom line charts
(main.py:268-311, 475-510) and adds what it lacked (SURVEY.md §5:
"Tracing / profiling: none"): a JSONL metrics sink every run can tail,
and `jax.profiler` trace hooks for TPU timeline capture.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional


class MetricLogger:
    """Append-only JSONL metrics sink (timestamps added), with an
    optional TensorBoard scalar mirror (lazy tf import)."""

    def __init__(self, path: Optional[str] = None, echo: bool = False,
                 tensorboard_dir: Optional[str] = None):
        self.path = path
        self.echo = echo
        self.history = []
        self._tb = None
        self._tb_dir = tensorboard_dir
        self._tb_step = 0

    def _tb_writer(self):
        if self._tb is None and self._tb_dir:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(self._tb_dir)
            except Exception as e:  # tf not installed -> JSONL only
                print(f"[logging] tensorboard sink unavailable: {e}")
                self._tb_dir = None
        return self._tb

    def log(self, metrics: Dict):
        rec = {"ts": time.time(),
               **{k: (float(v) if hasattr(v, "__float__") else v)
                  for k, v in metrics.items()}}
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        tb = self._tb_writer()
        if tb is not None:
            step = int(rec.get("step", self._tb_step))
            self._tb_step = max(self._tb_step, step) + 1
            for k, v in rec.items():
                if k not in ("ts", "step") and isinstance(v, float):
                    tb.scalar(k, v, step)
        if self.echo:
            print(json.dumps(rec))

    def close(self):
        if self._tb is not None:
            self._tb.flush()


class ProfilerHooks:
    """jax.profiler trace context for a window of steps.

    Usage:
        prof = ProfilerHooks("/tmp/trace", start_step=10, num_steps=5)
        for step in ...:
            prof.maybe_start(step)
            ... run step ...
            prof.maybe_stop(step)
    """

    def __init__(self, log_dir: str, start_step: int = 10,
                 num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    @property
    def active(self) -> bool:
        return self._active

    def maybe_start(self, step: int):
        if step == self.start_step and not self._active:
            import jax
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int):
        if step == self.stop_step and self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
