"""Profiling & step-timing subsystem.

The reference has no tracing/profiling at all (SURVEY.md §5.1 — only tqdm
bars); this module makes it first-class:

- ``trace(logdir)``: context manager around ``jax.profiler`` trace
  capture (open the dump in TensorBoard / xprof for per-op HLO timings)
- ``StepTimer``: wall-clock per-step statistics with warmup discard and
  utterances/sec derivation; drives the CSV 'epoch_seconds' column and
  bench-style throughput summaries
- ``device_memory_stats``: live HBM usage per device where the backend
  exposes it
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Per-step wall-clock stats; call tick() after each blocking step."""

    warmup: int = 2
    _t_last: Optional[float] = None
    _durations: List[float] = field(default_factory=list)
    _seen: int = 0

    def start(self) -> None:
        self._t_last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        if self._t_last is None:
            self._t_last = now
            return 0.0
        dt = now - self._t_last
        self._t_last = now
        self._seen += 1
        if self._seen > self.warmup:
            self._durations.append(dt)
        return dt

    def summary(self, items_per_step: Optional[int] = None) -> Dict[str, float]:
        if not self._durations:
            return {"steps": 0}
        d = np.asarray(self._durations)
        out = {
            "steps": int(len(d)),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "max_s": float(d.max()),
        }
        if items_per_step:
            out["items_per_sec"] = items_per_step / out["mean_s"]
        return out


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory stats (bytes) where the backend reports them."""
    out = {}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[str(dev)] = {
                "bytes_in_use": float(stats.get("bytes_in_use", 0)),
                "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
                "bytes_limit": float(stats.get("bytes_limit", 0)),
            }
    return out
