"""Host-side waveform utilities: fixed-length crop / repeat-tile, WAV read.

The whole pipeline runs on a fixed 64,600-sample (~4 s @ 16 kHz) crop so
every downstream shape is static and XLA compiles exactly once
(reference: data_utils_SSL.py:58-65,78).

FLAC decode is provided by the first-party native decoder in
``sls_tpu.data.flac`` (the reference used librosa/libsndfile, which this
environment does not ship); WAV (In-the-Wild) is read with the stdlib
``wave`` module.
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Union

import numpy as np

PathLike = Union[str, Path]

# ~4 seconds at 16 kHz; yields exactly 201 encoder frames (stride 320).
DEFAULT_CUT = 64600
SAMPLE_RATE = 16000


def pad_or_tile(x: np.ndarray, max_len: int = DEFAULT_CUT) -> np.ndarray:
    """Crop to ``max_len`` samples, or repeat-tile short audio up to it.

    Semantics match the reference's ``pad`` exactly
    (reference: data_utils_SSL.py:58-65): long clips are head-cropped,
    short clips are tiled whole and then cut.
    """
    x = np.asarray(x)
    n = x.shape[0]
    if n == 0:
        return np.zeros(max_len, dtype=x.dtype if x.dtype.kind == "f" else np.float32)
    if n >= max_len:
        return x[:max_len]
    reps = max_len // n + 1
    return np.tile(x, reps)[:max_len]


def read_wav(path: PathLike) -> np.ndarray:
    """Read a PCM WAV file to float32 in [-1, 1], mono-downmixed.

    In-the-Wild audio is 16 kHz 16-bit mono WAV; other sample widths are
    handled for robustness.  Matches librosa.load(sr=16000) semantics for
    files already at 16 kHz (no resampling is performed here — use
    ``resample_poly`` for off-rate files).
    """
    return read_wav_rate(path)[0]


def read_wav_rate(path: PathLike):
    """(samples, sample_rate) for a WAV file — one open, one parse."""
    with wave.open(str(path), "rb") as w:
        rate = w.getframerate()
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)

    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        val = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width: {sampwidth}")

    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, rate


def resample(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample (reference: torchaudio Resample in
    eval_2021_LA_torchaudio.py:54-56 for off-rate files)."""
    if sr == target_sr or x.size == 0:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(target_sr, sr)
    return resample_poly(x, target_sr // g, sr // g).astype(np.float32)


def resample_to_16k(x: np.ndarray, sr: int) -> np.ndarray:
    """``resample`` to the pipeline's 16 kHz."""
    return resample(x, sr, SAMPLE_RATE)


# exception types that mean THE FILE is bad (truncated/corrupt/not
# really audio) — anything else (missing scipy, native-lib build
# failure, permission/IO problems) is an infrastructure error and must
# propagate instead of silently zero-filling the dataset
_CORRUPT_FILE_ERRORS = (wave.Error, ValueError, EOFError)


def load_audio(path: PathLike, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Load FLAC or WAV to float32 mono, resampled to ``target_sr``.

    Corrupt files return an empty array so batch-level zero-fallback can
    keep score files complete (reference:
    eval_2021_LA_torchaudio.py:65-69); infrastructure failures raise.
    """
    p = Path(path)
    suffix = p.suffix.lower()
    if suffix not in (".wav", ".flac"):
        # unsupported format is a configuration error, not corrupt data
        raise ValueError(f"unsupported audio format: {p.suffix}")
    try:
        if suffix == ".wav":
            data, sr = read_wav_rate(p)
        else:
            from sls_tpu.data.flac import read_flac_rate

            data, sr = read_flac_rate(p)
    except FileNotFoundError:
        raise
    except _CORRUPT_FILE_ERRORS:
        return np.zeros(0, dtype=np.float32)
    return resample(data, sr, target_sr)
