"""Tracing / profiling utilities (SURVEY.md §5: absent in the reference —
only a LoopInfo ETA printer; the TPU build adds jax.profiler traces and
per-step timing)."""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler traces: ``with annotate('generate'): ...``"""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-clock stats + optional jsonl log.

    Usage::
        timer = StepTimer(log_path)
        with timer.step():
            ... one training step ...
        print(timer.summary())
    """

    def __init__(self, log_path: str | None = None, warmup_steps: int = 1):
        self.log_path = log_path
        self.warmup_steps = warmup_steps
        self.times: list[float] = []
        self._n = 0
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)

    @contextlib.contextmanager
    def step(self):
        t0 = time.time()
        yield
        dt = time.time() - t0
        self._n += 1
        if self._n > self.warmup_steps:
            self.times.append(dt)
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(json.dumps({"step": self._n, "seconds": dt}) + "\n")

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {"steps": n,
                "mean_s": sum(ts) / n,
                "p50_s": ts[n // 2],
                "p90_s": ts[min(n - 1, int(0.9 * n))],
                "steps_per_s": n / sum(ts)}


def device_memory_stats():
    """Per-device memory stats when the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
