"""Host-side input pipeline: dataset indices and prefetching batch loaders.

Replaces the reference's torch ``Dataset``/``DataLoader`` worker processes
(reference: data_utils_SSL.py:68-135, main.py:695-710) with a
thread-prefetched loader that emits fixed-shape numpy batches:

- decode (FLAC via the native decoder / WAV via stdlib) + repeat-tile pad
  happen on loader threads
- RawBoost augmentation does NOT happen here — it runs on-device
  (sls_tpu.augment.rawboost.rawboost_batch), removing the reference's
  CPU augmentation bottleneck
- deterministic shuffling keyed by (seed, epoch); drop_last=False with a
  final partial batch padded by repetition and masked, so shapes stay
  static for XLA
- corrupt files decode to empty -> zero waveform fallback keeps score
  files complete (reference: eval_2021_LA_torchaudio.py:65-69)
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

from sls_tpu.data.audio import DEFAULT_CUT, load_audio, pad_or_tile

PathLike = Union[str, Path]


@dataclass
class DatasetIndex:
    """Resolved file list for one split."""

    utt_ids: List[str]
    paths: List[Path]
    labels: Optional[np.ndarray] = None  # int64 [N], 1 = bonafide

    def __len__(self) -> int:
        return len(self.utt_ids)

    @staticmethod
    def for_train(
        utt_ids: Sequence[str], labels: Dict[str, int], base_dir: PathLike,
        ext: str = "flac",
    ) -> "DatasetIndex":
        """2019-LA-style layout: <base_dir>/flac/<utt>.flac
        (reference: data_utils_SSL.py:87)."""
        base = Path(base_dir)
        return DatasetIndex(
            utt_ids=list(utt_ids),
            paths=[base / "flac" / f"{u}.{ext}" for u in utt_ids],
            labels=np.asarray([labels[u] for u in utt_ids], np.int64),
        )

    @staticmethod
    def for_eval(
        utt_ids: Sequence[str], base_dir: PathLike, ext: str = "flac"
    ) -> "DatasetIndex":
        """2021 eval layout: <base_dir>/flac/<utt>.flac
        (reference: data_utils_SSL.py:112)."""
        base = Path(base_dir)
        return DatasetIndex(
            utt_ids=list(utt_ids),
            paths=[base / "flac" / f"{u}.{ext}" for u in utt_ids],
        )

    @staticmethod
    def for_in_the_wild(utt_ids: Sequence[str], base_dir: PathLike) -> "DatasetIndex":
        """In-the-Wild layout: ids already carry '.wav'
        (reference: data_utils_SSL.py:132)."""
        base = Path(base_dir)
        return DatasetIndex(
            utt_ids=list(utt_ids), paths=[base / u for u in utt_ids]
        )

    def host_shard(
        self,
        process_index: int,
        process_count: int,
        drop_remainder: bool = False,
    ) -> "DatasetIndex":
        """Per-host slice for multi-host SPMD: host i reads examples
        i, i+N, i+2N, ... (the cross-host input pipeline that replaces
        DataLoader workers; SURVEY.md §5.8).  Strided so class balance
        is preserved per host.

        ``drop_remainder=True`` truncates every shard to the same length
        (floor(N / process_count)) — required for TRAIN loaders, whose
        jitted steps run over the global mesh and therefore need every
        host to execute the same number of batches per epoch.  Eval /
        scoring shards keep the default cover-all semantics (each host
        scores independently on its local mesh)."""
        sel = list(range(process_index, len(self.utt_ids), process_count))
        if drop_remainder:
            sel = sel[: len(self.utt_ids) // process_count]
        return DatasetIndex(
            utt_ids=[self.utt_ids[i] for i in sel],
            paths=[self.paths[i] for i in sel],
            labels=None if self.labels is None else self.labels[sel],
        )


def _decode_one(path: Path, cut: int) -> np.ndarray:
    wav = load_audio(path)
    if wav.shape[0] == 0:  # corrupt-file zero fallback
        return np.zeros(cut, np.float32)
    return pad_or_tile(wav, cut).astype(np.float32)


@dataclass
class Batch:
    wav: np.ndarray  # [B, cut] float32 (or int16 wire, see to_wire)
    utt_ids: List[str]
    labels: Optional[np.ndarray]  # [B] int64 or None
    valid: np.ndarray  # [B] bool — False on repeated tail-fill rows


def to_wire(wavs: np.ndarray, wire_dtype: str) -> np.ndarray:
    """Convert decoded float32 audio to the host->device wire format.

    ``int16`` halves the bytes crossing PCIe/DMA per batch; the jitted
    steps dequantize with ``wav * (1/32768)`` on device (free — fused
    into the first conv).  For 16-bit sources (all ASVspoof corpora are
    16-bit FLAC) the decoder emits exactly ``i16/32768``, so the round
    trip is LOSSLESS and scores are bit-identical to the float32 wire;
    resampled or >16-bit sources round by at most half an LSB (-96 dB).

    ``mulaw`` halves the bytes AGAIN (8-bit G.711-style companding,
    data/mulaw.py) — LOSSY (~35-38 dB speech SNR), strictly opt-in for
    wire-bandwidth-bound serving; accuracy gate in tests/test_mulaw.py.
    """
    if wire_dtype == "float32":
        return wavs
    if wire_dtype == "int16":
        return np.clip(
            np.rint(wavs.astype(np.float32) * 32768.0), -32768, 32767
        ).astype(np.int16)
    if wire_dtype == "mulaw":
        from sls_tpu.data.mulaw import mulaw_encode

        return mulaw_encode(wavs)
    raise ValueError(f"unknown wire_dtype: {wire_dtype!r}")


class BatchLoader:
    """Thread-prefetched fixed-shape batch iterator."""

    def __init__(
        self,
        index: DatasetIndex,
        batch_size: int,
        *,
        cut: int = DEFAULT_CUT,
        shuffle: bool = False,
        seed: int = 1234,
        num_threads: int = 8,
        prefetch: int = 4,
        limit_batches: Optional[int] = None,
        wire_dtype: str = "float32",
        decode_threads: int = 0,
    ):
        self.index = index
        self.batch_size = batch_size
        self.cut = cut
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = max(1, num_threads)
        # native decode threads PER producer; 0 = auto (host cores spread
        # across the live producers, so total decode parallelism tracks
        # the machine instead of a fixed constant — a hard cap of 4 was
        # measured fine on the 1-core bench image but starves many-core
        # production hosts)
        self.decode_threads = decode_threads
        self.prefetch = prefetch
        self.limit_batches = limit_batches
        to_wire(np.zeros(1, np.float32), wire_dtype)  # validate early
        self.wire_dtype = wire_dtype

    def _order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.index))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        return order

    def num_batches(self) -> int:
        n = (len(self.index) + self.batch_size - 1) // self.batch_size
        if self.limit_batches is not None:
            n = min(n, self.limit_batches)
        return n

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        """Yield batches for one epoch; decode parallelized across
        ``num_threads`` with ``prefetch`` batches in flight."""
        order = self._order(epoch)
        n_batches = self.num_batches()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        all_flac = all(p.suffix.lower() == ".flac" for p in self.index.paths)
        n_producers = min(self.num_threads, max(n_batches, 1))
        decode_threads = self.decode_threads or max(
            1, (os.cpu_count() or 1) // n_producers
        )

        def assemble(batch_idx: int) -> Batch:
            lo = batch_idx * self.batch_size
            sel = order[lo : lo + self.batch_size]
            valid = np.ones(self.batch_size, bool)
            if len(sel) < self.batch_size:  # static shapes: tile the tail
                valid[len(sel):] = False
                sel = (
                    np.resize(sel, self.batch_size)
                    if len(sel)
                    else np.zeros(self.batch_size, np.int64)
                )
            if all_flac:
                # single native call: parallel decode + pad/tile in C++
                # (GIL-free; threads scale with host cores in production).
                # The int16 wire conversion also happens in the workers —
                # a numpy pass here measured 3.5x slower decode-only
                # throughput on the 1-core bench image (380 -> 107 utts/s)
                from sls_tpu.data.flac import decode_batch

                if self.wire_dtype == "mulaw":
                    # decode int16 in C++, compand via one vectorized
                    # table take (exact on the int16 grid; no per-sample
                    # log on the host path — data/mulaw.py)
                    from sls_tpu.data.mulaw import mulaw_from_int16

                    wavs = mulaw_from_int16(decode_batch(
                        [self.index.paths[i] for i in sel], self.cut,
                        n_threads=decode_threads, dtype="int16",
                    ))
                else:
                    wavs = decode_batch(
                        [self.index.paths[i] for i in sel], self.cut,
                        n_threads=decode_threads,
                        dtype=self.wire_dtype,
                    )
            else:
                wavs = to_wire(np.stack(
                    [_decode_one(self.index.paths[i], self.cut) for i in sel]
                ), self.wire_dtype)
            labels = (
                self.index.labels[sel] if self.index.labels is not None else None
            )
            return Batch(
                wav=wavs,
                utt_ids=[self.index.utt_ids[i] for i in sel],
                labels=labels,
                valid=valid,
            )

        def safe_put(item) -> bool:
            # bounded put that respects shutdown (a consumer break must not
            # leave producers blocked on a full queue forever)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        # producer-side watermark: without it, one stalled batch lets
        # every OTHER producer run arbitrarily far ahead (the consumer
        # must keep draining the queue to find the in-order batch, so
        # the queue bound alone is no backpressure — the overflow just
        # accumulates in the consumer's reorder dict).  The bound must
        # sit on the producers: blocking the consumer's drain instead
        # would deadlock, since the stalled batch needs a queue slot.
        max_ahead = self.prefetch + 2 * n_producers
        consumed = [0]  # next in-order batch the consumer needs

        def producer(worker: int):
            for b in range(worker, n_batches, self.num_threads):
                while b > consumed[0] + max_ahead and not stop.is_set():
                    stop.wait(0.05)
                if stop.is_set():
                    return
                try:
                    if not safe_put((b, assemble(b))):
                        return
                except Exception as exc:  # surface decode errors
                    safe_put((b, exc))
                    return

        threads = [
            threading.Thread(target=producer, args=(w,), daemon=True)
            for w in range(n_producers)
        ]
        for t in threads:
            t.start()

        try:
            pending: Dict[int, Batch] = {}
            next_b = 0
            received = 0
            while next_b < n_batches:
                while next_b not in pending and received < n_batches:
                    b, item = out_q.get()
                    if isinstance(item, Exception):
                        raise item
                    pending[b] = item
                    received += 1
                yield pending.pop(next_b)
                next_b += 1
                consumed[0] = next_b
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=0.5)


class ArrayLoader:
    """In-memory loader with the same Batch interface — synthetic data,
    tests, and the quick_test escape hatch."""

    def __init__(self, wavs: np.ndarray, labels: Optional[np.ndarray],
                 utt_ids: Optional[List[str]] = None, batch_size: int = 8,
                 shuffle: bool = False, seed: int = 1234):
        self.wavs = wavs
        self.labels = labels
        self.utt_ids = utt_ids or [f"utt_{i}" for i in range(len(wavs))]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed

    def num_batches(self) -> int:
        return (len(self.wavs) + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        order = np.arange(len(self.wavs))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        bs = self.batch_size
        for lo in range(0, len(order), bs):
            sel = order[lo : lo + bs]
            valid = np.ones(bs, bool)
            if len(sel) < bs:
                valid[len(sel):] = False
                reps = int(np.ceil(bs / len(sel)))
                sel = np.tile(sel, reps)[:bs]
            yield Batch(
                wav=self.wavs[sel],
                utt_ids=[self.utt_ids[i] for i in sel],
                labels=None if self.labels is None else self.labels[sel],
                valid=valid,
            )
