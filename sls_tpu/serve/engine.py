"""Dynamic batching engine for online anti-spoofing inference.

The reference scores static eval lists offline with a DataLoader
(reference: main.py:158-199).  Serving inverts the problem: requests
arrive one at a time at unpredictable rates, while the TPU wants
fixed-shape batches at the calibrated layout sweet spot (bench.py:
b36 measured 1.163 ms/utt vs 1.48+ at neighboring batches).  The
engine bridges the two:

- callers ``submit()`` single utterances and get a ``Future``;
- a worker thread assembles fixed-shape batches — waiting at most
  ``max_wait_ms`` to fill one, so a lone request never waits for 35
  peers that may not come;
- short batches tile row 0 into the tail (the same static-shape trick
  as parallel/mesh.pad_batch_to_devices) and only real rows are
  answered;
- one dispatched batch stays in flight while the next assembles: JAX's
  async dispatch means ``score_fn`` returns a device future, and the
  blocking host fetch of batch N overlaps device compute of batch N+1.

The score contract matches the offline path exactly (train/loop.py
produce_scores; reference main.py:183-185): ``score_fn`` returns
log-softmax outputs ``[B, 2]`` and the engine emits
``P(bonafide) = exp(min(log_probs, 0))[:, 1]`` in float64, so a served
score equals the score file entry for the same audio bit-for-bit.
"""

from __future__ import annotations

import threading
import time
import queue
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from sls_tpu.data.audio import DEFAULT_CUT, pad_or_tile
from sls_tpu.data.pipeline import to_wire


@dataclass
class EngineStats:
    """Snapshot of serving counters (see BatchingEngine.stats)."""

    requests: int
    batches: int
    mean_fill: float  # real rows per batch / batch_size
    p50_ms: float
    p95_ms: float
    p99_ms: float

    def to_dict(self) -> dict:
        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_fill": round(self.mean_fill, 4),
            "p50_ms": round(self.p50_ms, 3),
            "p95_ms": round(self.p95_ms, 3),
            "p99_ms": round(self.p99_ms, 3),
        }


@dataclass
class _Request:
    wav: np.ndarray  # [cut] float32, already pad_or_tile'd
    future: Future
    t_submit: float


def _log_probs_to_scores(log_probs: np.ndarray) -> np.ndarray:
    """The repo-wide score contract (train/loop.py produce_scores):
    float64 exp so confident trials don't collapse into float32 ties,
    and a 0.0 clamp because float32 log_softmax can round to tiny
    positive values for p ~ 1."""
    logp = np.asarray(log_probs)
    return np.exp(np.minimum(logp, 0.0).astype(np.float64))[:, 1]


class BatchingEngine:
    """Collects single-utterance requests into fixed-shape batches.

    Parameters
    ----------
    score_fn: (wav [B, cut] wire dtype) -> log_probs [B, 2].  May return
        a device array — the engine defers the host fetch to keep one
        batch in flight (JAX async dispatch).
    batch_size: the fixed batch every dispatch uses (b36 is the
        measured flagship sweet spot, bench.py).
    max_wait_ms: how long a non-full batch waits for more requests
        before dispatching short.  0 dispatches whatever is queued.
    wire_dtype: "float32", "int16" (halves host->device bytes;
        lossless for 16-bit sources), or "mulaw" (1 byte/sample,
        LOSSY companding — data/pipeline.to_wire) for
        wire-bandwidth-bound deployments.
    bucket_sizes: optional smaller batch shapes (e.g. (9, 18) under
        batch_size 36).  A partial batch dispatches on the smallest
        shape that fits instead of padding all the way to batch_size,
        cutting low-traffic latency at zero cost to full-batch
        capacity.  Each shape is a separate XLA program: score_fn must
        accept every listed shape (a jitted forward compiles each on
        first use; scorer.build_scorer pre-warms them).  NOT for
        exported artifacts — those are fixed at one shape and cannot
        retrace (serve/export.py).
    """

    def __init__(
        self,
        score_fn: Callable,
        batch_size: int,
        *,
        cut: int = DEFAULT_CUT,
        max_wait_ms: float = 8.0,
        wire_dtype: str = "float32",
        queue_depth: int = 1024,
        bucket_sizes: Optional[tuple] = None,
    ):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        buckets = sorted(set(bucket_sizes or ()))
        if buckets and not (1 <= buckets[0] and buckets[-1] < batch_size):
            raise ValueError(
                f"bucket_sizes must lie in [1, batch_size); got "
                f"{bucket_sizes} with batch_size {batch_size}")
        to_wire(np.zeros(1, np.float32), wire_dtype)  # validate early
        self.score_fn = score_fn
        self.batch_size = batch_size
        self.shapes = tuple(buckets) + (batch_size,)
        self.cut = cut
        self.max_wait_ms = max_wait_ms
        self.wire_dtype = wire_dtype
        self._q: "queue.Queue[_Request]" = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        self._requests = 0
        self._batches = 0
        self._fill_sum = 0.0
        self._latencies: deque = deque(maxlen=10_000)

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "BatchingEngine":
        if self._worker is not None:
            raise RuntimeError("engine already started")
        # a stop()ed engine can be start()ed again: clear the stop flag
        # so the new worker doesn't exit immediately (stop() leaves it
        # set to fail in-flight submits)
        self._stop.clear()
        self._worker = threading.Thread(
            target=self._run, name="sls-serve-batcher", daemon=True
        )
        self._worker.start()
        return self

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout)
            self._worker = None
        # Fail any stragglers loudly instead of hanging their callers.
        # Taking _lock first closes the submit race: _submit_row holds
        # _lock across its stop-check + put, so once we hold it every
        # submit that passed the check has already landed in the queue
        # (and later submits see _stop set and raise).
        with self._lock:
            pass
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            try:
                req.future.set_exception(RuntimeError("engine stopped"))
            except Exception:
                pass  # already failed by the submit-side overload path

    def __enter__(self) -> "BatchingEngine":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- request path ------------------------------------------------------

    def submit(self, wav: np.ndarray, sample_rate: int = 16000) -> Future:
        """Queue one utterance; resolves to float P(bonafide).

        Arbitrary-length audio is repeat-tiled/cropped to the model's
        fixed cut on the caller thread (the reference's pad(),
        data_utils_SSL.py:58-65) — cheap, and it keeps the worker doing
        nothing but assembly and dispatch.  Non-16k audio is resampled
        (the reference's torchaudio eval variant behavior).
        """
        wav = self._prepare(wav, sample_rate)
        return self._submit_row(pad_or_tile(wav, self.cut))

    def _prepare(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        wav = np.asarray(wav, np.float32).reshape(-1)
        if wav.size == 0:
            raise ValueError("empty audio")
        if sample_rate != 16000:
            from sls_tpu.data.audio import resample_to_16k

            wav = resample_to_16k(wav, sample_rate)
        return wav

    def _submit_row(self, row: np.ndarray) -> Future:
        # Fail loudly instead of enqueueing into a worker-less engine,
        # where the future would never resolve and the caller would
        # block until its own timeout.  The stop-check and the put sit
        # under _lock, and stop() acquires _lock before its drain sweep
        # — so a submit either sees _stop set (raises here) or its put
        # lands before the drain (its future is failed by stop()).
        fut: Future = Future()
        req = _Request(wav=np.asarray(row, np.float32), future=fut,
                       t_submit=time.monotonic())
        with self._lock:
            if self._worker is None or self._stop.is_set():
                raise RuntimeError(
                    "engine is not running (start() it, and submit "
                    "before stop(); a stopped engine can be start()ed "
                    "again)")
            try:
                self._q.put_nowait(req)
                self._requests += 1
                return fut
            except queue.Full:
                pass
        # Queue full (overload): block for backpressure OUTSIDE the lock
        # (a blocking put under _lock would deadlock against the worker's
        # _flush, which takes _lock to record stats).  This reopens a
        # narrow stop() race, so re-check after the put and fail our own
        # future if stop's drain sweep may have already passed it by.
        self._q.put(req)
        with self._lock:
            self._requests += 1
        if self._stop.is_set():
            try:
                fut.set_exception(RuntimeError("engine stopped"))
            except Exception:
                pass  # already resolved by the worker or stop's drain
        return fut

    def submit_windows(self, wav: np.ndarray, sample_rate: int = 16000,
                       stride: Optional[int] = None) -> List[Future]:
        """One future per overlapping window of a LONG utterance.

        Window extraction follows the offline full-utterance contract
        exactly (evaluation/overlap.extract_windows: stride cut//2 by
        default, tail window right-aligned, short audio repeat-tiled to
        one window), so a served long-clip score aggregates the same
        per-window scores the offline ``--full_utterance`` path uses.
        Windows interleave with other traffic in the batcher.
        """
        from sls_tpu.evaluation.overlap import extract_windows

        wav = self._prepare(wav, sample_rate)
        rows = extract_windows(wav, self.cut, stride)
        return [self._submit_row(r) for r in rows]

    def score(self, wav: np.ndarray, sample_rate: int = 16000,
              timeout: Optional[float] = 30.0) -> float:
        """Blocking convenience wrapper around submit()."""
        return self.submit(wav, sample_rate).result(timeout)

    def score_long(self, wav: np.ndarray, sample_rate: int = 16000,
                   stride: Optional[int] = None, aggregate: str = "mean",
                   timeout: Optional[float] = 120.0):
        """Blocking long-clip score: (aggregated P(bonafide), n_windows).

        ``aggregate`` mirrors evaluation/overlap.score_full_utterance:
        'mean' (default), 'min' (one spoofed span flags the clip), 'max'.
        """
        agg = {"mean": np.mean, "min": np.min, "max": np.max}[aggregate]
        futs = self.submit_windows(wav, sample_rate, stride)
        vals = [f.result(timeout) for f in futs]
        return float(agg(vals)), len(vals)

    # -- stats -------------------------------------------------------------

    def reset_stats(self) -> None:
        """Zero the counters and latency record (e.g. after a warmup
        pass whose compile-time latencies would poison percentiles —
        bench_serve measured a 149.8 s warmup request landing in p95)."""
        with self._lock:
            self._requests = 0
            self._batches = 0
            self._fill_sum = 0.0
            self._latencies.clear()

    def stats(self) -> EngineStats:
        with self._lock:
            lats = np.asarray(self._latencies, np.float64)
            requests, batches, fill = (
                self._requests, self._batches, self._fill_sum,
            )
        if lats.size:
            p50, p95, p99 = np.percentile(lats, [50, 95, 99])
        else:
            p50 = p95 = p99 = 0.0
        return EngineStats(
            requests=requests,
            batches=batches,
            mean_fill=(fill / batches) if batches else 0.0,
            p50_ms=float(p50),
            p95_ms=float(p95),
            p99_ms=float(p99),
        )

    # -- worker ------------------------------------------------------------

    def _collect(self, have_pending: bool = False) -> List[_Request]:
        """Block for the first request, then fill up to batch_size
        within the max_wait window.

        With a batch already in flight the first-request wait is cut to
        5 ms: the 100 ms idle poll would otherwise sit between the
        in-flight batch finishing on device and its flush, adding up to
        100 ms to every pipelined request's latency at low traffic."""
        try:
            first = self._q.get(timeout=0.005 if have_pending else 0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # max_wait exhausted; take anything already queued but
                # don't wait for more
                try:
                    items.append(self._q.get_nowait())
                    continue
                except queue.Empty:
                    break
            try:
                items.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _dispatch(self, items: List[_Request]):
        rows = [r.wav for r in items]
        n_real = len(rows)
        # smallest compiled shape that fits (shapes is sorted; the last
        # entry is batch_size, so one always fits)
        shape = next(s for s in self.shapes if s >= n_real)
        if n_real < shape:
            # static shapes: tile row 0 into the tail (same trick as
            # parallel/mesh.pad_batch_to_devices); tail rows never
            # resolve a future
            rows = rows + [rows[0]] * (shape - n_real)
        wav = to_wire(np.stack(rows), self.wire_dtype)
        out = self.score_fn(wav)  # device future under JAX async dispatch
        return items, out

    def _flush(self, pending) -> None:
        items, out = pending
        try:
            scores = _log_probs_to_scores(out)  # blocks on the device here
        except Exception as e:  # propagate to every caller in the batch
            for r in items:
                r.future.set_exception(e)
            return
        now = time.monotonic()
        with self._lock:
            self._batches += 1
            self._fill_sum += len(items) / self.batch_size
            for r in items:
                self._latencies.append((now - r.t_submit) * 1000.0)
        for r, s in zip(items, scores):
            r.future.set_result(float(s))

    def _run(self) -> None:
        pending = None  # one batch in flight: fetch of N overlaps compute of N+1
        while not self._stop.is_set():
            items = self._collect(have_pending=pending is not None)
            if not items:
                if pending is not None:
                    self._flush(pending)
                    pending = None
                continue
            try:
                dispatched = self._dispatch(items)
            except Exception as e:
                for r in items:
                    r.future.set_exception(e)
                continue
            if pending is not None:
                self._flush(pending)
            pending = dispatched
            if self._q.empty():
                # idle: answer immediately rather than holding the batch
                # for a pipeline partner that may never arrive
                self._flush(pending)
                pending = None
        if pending is not None:
            self._flush(pending)
