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
    """Append-only JSONL metrics sink (timestamps added)."""

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self.history = []

    def log(self, metrics: Dict):
        rec = {"ts": time.time(),
               **{k: (float(v) if hasattr(v, "__float__") else v)
                  for k, v in metrics.items()}}
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.echo:
            print(json.dumps(rec))


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
