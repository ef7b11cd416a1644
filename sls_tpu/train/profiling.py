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


def op_histogram(
    trace_dir: str,
    lane_filter: Optional[str] = None,
    group: bool = True,
) -> Dict[str, Dict[str, float]]:
    """Aggregate per-op device time from a ``trace(logdir)`` capture.

    Parses the perfetto JSON dump jax.profiler writes under
    ``trace_dir/plugins/profile/<ts>/*.trace.json.gz`` and returns
    ``{op_name: {"ms": total_ms, "count": n}}`` summed over the device
    execution lanes.  This is the tool that root-caused the SLS head's
    +21 ms (BENCH_NOTES_r4 sls_head_root_cause): diffing two histograms
    shows exactly which fusion class a model change moved.

    ``lane_filter``: substring a lane's process name must contain
    (default: TPU/device lanes).  ``group=True`` collapses numbered
    instances (``fusion.123`` -> ``fusion``) so histograms from
    different compiles are comparable; ``jit_``-prefixed module-scope
    events are skipped either way.
    """
    import glob as _glob
    import gzip as _gzip
    import json as _json
    import re as _re

    paths = _glob.glob(
        str(trace_dir) + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {trace_dir} - pass the logdir "
            "given to profiling.trace()")
    agg: Dict[str, Dict[str, float]] = {}
    for path in sorted(paths):
        with _gzip.open(path, "rt") as fh:
            events = _json.load(fh).get("traceEvents", [])
        pid_names = {
            e.get("pid"): e.get("args", {}).get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        for e in events:
            if e.get("ph") != "X":
                continue
            pname = pid_names.get(e.get("pid"), "")
            if lane_filter is not None:
                if lane_filter not in pname:
                    continue
            elif "TPU" not in pname and "device" not in pname.lower():
                continue
            name = e.get("name", "?")
            if name.startswith("jit_"):
                continue
            if group:
                name = _re.sub(r"[.\d]+$", "", name)
            slot = agg.setdefault(name, {"ms": 0.0, "count": 0})
            slot["ms"] += e.get("dur", 0) / 1e3
            slot["count"] += 1
    return agg


def compare_profiles(
    a: Dict[str, Dict[str, float]],
    b: Dict[str, Dict[str, float]],
    min_ms: float = 0.05,
) -> List[Dict[str, float]]:
    """Diff two ``op_histogram`` results; rows sorted by descending
    ``delta_ms`` (b minus a).  Feed A = baseline program, B = candidate:
    the top rows name the op classes the change made slower."""
    rows = []
    for name in sorted(set(a) | set(b)):
        am = a.get(name, {}).get("ms", 0.0)
        bm = b.get(name, {}).get("ms", 0.0)
        if max(am, bm) < min_ms:
            continue
        rows.append({
            "op": name,
            "a_ms": round(am, 3),
            "a_count": int(a.get(name, {}).get("count", 0)),
            "b_ms": round(bm, 3),
            "b_count": int(b.get(name, {}).get("count", 0)),
            "delta_ms": round(bm - am, 3),
        })
    rows.sort(key=lambda r: -r["delta_ms"])
    return rows
