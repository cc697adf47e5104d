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


class ProfileWindow:
    """Capture an XLA device trace of ONE steady-state training epoch.

    Active only when ANODDPM_PROFILE_DIR is set.  By default it traces
    relative epoch 1 (the second epoch of the run — after the step has
    compiled), overridable with ANODDPM_PROFILE_EPOCH.  Open the trace with
    TensorBoard/xprof.  This is the hook the reference lacks entirely
    (its loop is print-only, diffusion_training.py:118-137)."""

    def __init__(self, name: str = "train", epoch_index: int = 1):
        self.dir = os.environ.get("ANODDPM_PROFILE_DIR")
        self.epoch_index = int(
            os.environ.get("ANODDPM_PROFILE_EPOCH", epoch_index))
        self.name = name
        self._active = False

    def start_epoch(self, rel_epoch: int) -> None:
        if self.dir and not self._active and rel_epoch == self.epoch_index:
            import jax
            out = os.path.join(self.dir, self.name)
            os.makedirs(out, exist_ok=True)
            jax.profiler.start_trace(out)
            self._active = True

    def end_epoch(self, rel_epoch: int) -> None:
        if self._active and rel_epoch == self.epoch_index:
            self.stop()

    def stop(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


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
