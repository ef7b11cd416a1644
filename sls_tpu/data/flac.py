"""ctypes bindings for the native FLAC decoder (native/flac).

Auto-builds ``libslsaudio.so`` with make/g++ on first use if missing.
Exposes:

- ``read_flac(path)``            -> float32 mono array at native rate
- ``decode_batch(paths, cut)``   -> [N, cut] float32, multi-threaded
  native decode with repeat-tile padding (reference `pad` semantics,
  data_utils_SSL.py:58-65) and zero-fill for unreadable files
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np

PathLike = Union[str, Path]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native" / "flac"
_LIB_PATH = _NATIVE_DIR / "libslsaudio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

# generous cap: 10 minutes at 16 kHz (In-the-Wild clips are << this)
MAX_SAMPLES = 16000 * 600


def _build() -> None:
    subprocess.run(
        ["make", "-C", str(_NATIVE_DIR), "libslsaudio.so"],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.slsaudio_decode_flac_file.restype = ctypes.c_long
        lib.slsaudio_decode_flac_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.slsaudio_decode_batch.restype = ctypes.c_int
        lib.slsaudio_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.slsaudio_decode_batch_rates.restype = ctypes.c_int
        lib.slsaudio_decode_batch_rates.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.slsaudio_decode_batch_rates_i16.restype = ctypes.c_int
        lib.slsaudio_decode_batch_rates_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
        return lib


def read_flac_rate(
    path: PathLike, max_samples: int = MAX_SAMPLES
):
    """Decode one FLAC file -> (float32 mono in [-1, 1], sample_rate).

    Raises on unreadable/invalid files (callers implement zero-fallback)."""
    lib = _load()
    buf = np.empty(max_samples, np.float32)
    rate = ctypes.c_int(0)
    n = lib.slsaudio_decode_flac_file(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        ctypes.byref(rate),
    )
    if n < 0:
        # infrastructure failures (wrong --database_path, deleted shard)
        # must propagate as FileNotFoundError — load_audio's corrupt-file
        # zero-fallback deliberately re-raises it (audio.py) — while a
        # file that EXISTS but fails to decode is the corrupt-file case
        if not os.path.exists(path):
            raise FileNotFoundError(f"no such audio file: {path}")
        raise ValueError(f"failed to decode FLAC: {path}")
    return buf[:n].copy(), int(rate.value)


def read_flac(path: PathLike, max_samples: int = MAX_SAMPLES) -> np.ndarray:
    """Decode one FLAC file to float32 mono in [-1, 1]."""
    return read_flac_rate(path, max_samples)[0]


def decode_batch(
    paths: Sequence[PathLike],
    cut: int,
    n_threads: int = 0,
    target_sr: int = 16000,
    dtype: str = "float32",
) -> np.ndarray:
    """Decode + pad/tile a whole batch natively.  Returns [N, cut] in
    ``dtype`` (float32, or the int16 wire format — converted inside the
    decode workers while rows are cache-hot, see pipeline.to_wire);
    failed files come back as zero rows.

    Files at a sample rate other than ``target_sr`` are re-decoded in full
    and polyphase-resampled on the host (the reference's librosa path
    always resampled, data_utils_SSL.py:87; a silent rate mismatch would
    train/score at the wrong pitch/tempo).  Pass ``target_sr=0`` to skip
    the check.
    """
    lib = _load()
    n = len(paths)
    rates = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    if dtype == "int16":
        out = np.zeros((n, cut), np.int16)
        lib.slsaudio_decode_batch_rates_i16(
            arr, n, cut, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads,
        )
    elif dtype == "float32":
        out = np.zeros((n, cut), np.float32)
        lib.slsaudio_decode_batch_rates(
            arr, n, cut, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads,
        )
    else:
        raise ValueError(f"unknown decode dtype: {dtype!r}")
    # rate 0 marks a failed row.  Corrupt-but-present files keep the
    # documented zero-row fallback; MISSING files are an infrastructure
    # failure (wrong --database_path, deleted shard) and must raise —
    # otherwise a whole run can train/score on silent zeros (the rule
    # audio.load_audio documents).  The stat() only runs on failed rows.
    failed = np.nonzero(rates == 0)[0]
    if failed.size:
        missing = [str(paths[i]) for i in failed
                   if not os.path.exists(paths[i])]
        if missing:
            shown = ", ".join(missing[:3])
            raise FileNotFoundError(
                f"{len(missing)} of {n} batch files do not exist "
                f"(first: {shown}) — check the database path")
    if target_sr:
        for i in np.nonzero((rates != 0) & (rates != target_sr))[0]:
            from sls_tpu.data.audio import pad_or_tile, resample_to_16k

            wav, sr = read_flac_rate(paths[i])
            row = pad_or_tile(resample_to_16k(wav, sr), cut)
            if dtype == "int16":
                from sls_tpu.data.pipeline import to_wire

                row = to_wire(row, "int16")
            out[i] = row
    return out
