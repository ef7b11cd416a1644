"""8-bit mu-law wire codec: halve host->device audio bytes AGAIN.

The int16 wire (data/pipeline.to_wire) is lossless for 16-bit sources
and halves the float32 bytes.  For wire-bandwidth-bound deployments
(serving fleets fed over DCN; this image's relay uploads at ~38 MB/s)
mu-law companding halves the bytes again: 8 bits/sample at ~35-38 dB
speech SNR (G.711's telephony codec, continuous-mu variant, mu=255).

LOSSY — strictly opt-in, never the default, and never used by parity
or training paths.  The accuracy cost is measured, not assumed:
tests/test_mulaw.py trains the tiny separable detector and gates on
ΔEER = 0 with a recorded max |Δscore| bound, mirroring the int8
serving gate (tests/test_int8_eer_cost.py).

Encode (host, numpy): y = sign(x) * ln(1 + 255|x|) / ln(256),
u = rint((y + 1) * 127.5) in [0, 255].
Decode (device, fused into the first conv's input read —
train/steps.dequantize_wire): x = sign(y) * (256^|y| - 1) / 255.
"""

from __future__ import annotations

import numpy as np

_MU = 255.0
_LN256 = float(np.log(256.0))

_LUT_FROM_INT16: np.ndarray | None = None


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float audio in [-1, 1] -> uint8 mu-law codes."""
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / _LN256
    return np.rint((y + 1.0) * 127.5).astype(np.uint8)


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> float32 audio (numpy mirror of the device
    decode in train/steps.dequantize_wire, kept in sync by test)."""
    y = np.asarray(u, np.float32) / 127.5 - 1.0
    return (np.sign(y) * np.expm1(np.abs(y) * _LN256) / _MU).astype(
        np.float32
    )


def lut_from_int16() -> np.ndarray:
    """[65536] uint8 table mapping int16 PCM (offset by +32768) to
    mu-law codes — turns the per-batch companding of the native
    decoder's int16 output into one vectorized take instead of a
    log1p over every sample (the same reasoning that put the int16
    wire conversion inside the C++ workers, data/pipeline.py)."""
    global _LUT_FROM_INT16
    if _LUT_FROM_INT16 is None:
        grid = np.arange(-32768, 32768, dtype=np.float32) / 32768.0
        _LUT_FROM_INT16 = mulaw_encode(grid)
    return _LUT_FROM_INT16


def mulaw_from_int16(wav_i16: np.ndarray) -> np.ndarray:
    """int16 PCM -> uint8 mu-law via the table (exact for the int16
    grid by construction)."""
    idx = wav_i16.astype(np.int32) + 32768
    return lut_from_int16()[idx]
