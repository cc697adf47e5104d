"""Observability: structured metrics logging and profiler hooks.

The reference's only observability is stdout prints and wall-clock ETA
(diffusion_training.py:118-137; SURVEY.md §5 'Tracing/profiling: No').
Here every training run can emit:

- metrics/args{n}-train.jsonl — one JSON object per logging step (loss,
  grad norm, throughput, wall time), machine-readable;
- optional XLA device traces via jax.profiler when ANODDPM_PROFILE_DIR is
  set (open with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics writer."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, **metrics: Any) -> None:
        rec: Dict[str, Any] = {"step": int(step),
                               "wall_time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()


@contextlib.contextmanager
def maybe_profile(name: str = "train"):
    """Capture an XLA profiler trace when ANODDPM_PROFILE_DIR is set."""
    profile_dir = os.environ.get("ANODDPM_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax
    out = os.path.join(profile_dir, name)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield


class StepTimer:
    """Steady-state step timing with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.time()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.count += 1
            if self.count > self.warmup:
                self.total += dt
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        steady = self.count - self.warmup
        return self.total / steady if steady > 0 else float("nan")
