"""Minimal FLAC *encoder* — test fixture generator for the native decoder.

Produces spec-conformant FLAC bitstreams (STREAMINFO + frames) with
verbatim / constant / fixed-prediction(rice) subframes, fixed 16-bit
samples.  CRC fields are zero-filled: the production decoder consumes but
does not verify CRCs (corrupt data is handled by upstream zero-fallback).
Test-only code; the decode path under test lives in native/flac.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self.bytes.append(self._acc)
                self._acc = 0
                self._nbits = 0

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self._nbits:
            self.write(0, 1)


def _utf8_number(bw: BitWriter, v: int):
    if v < 0x80:
        bw.write(v, 8)
    elif v < 0x800:
        bw.write(0xC0 | (v >> 6), 8)
        bw.write(0x80 | (v & 0x3F), 8)
    else:
        bw.write(0xE0 | (v >> 12), 8)
        bw.write(0x80 | ((v >> 6) & 0x3F), 8)
        bw.write(0x80 | (v & 0x3F), 8)


def _write_residual_rice(bw: BitWriter, residuals: Sequence[int], rice: int):
    bw.write(0, 2)  # method: 4-bit rice
    bw.write(0, 4)  # partition order 0
    bw.write(rice, 4)
    for v in residuals:
        u = (-v << 1) - 1 if v < 0 else (v << 1)  # zigzag
        bw.write_unary(u >> rice)
        if rice:
            bw.write(u & ((1 << rice) - 1), rice)


def _write_subframe(bw: BitWriter, samples: np.ndarray, bps: int, mode: str,
                    rice: int = 4, fixed_order: int = 1):
    bw.write(0, 1)  # padding
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)  # no wasted bits
        for v in samples:
            bw.write_signed(int(v), bps)
    elif mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(int(samples[0]), bps)
    elif mode == "fixed":
        o = fixed_order
        bw.write(8 + o, 6)
        bw.write(0, 1)
        for v in samples[:o]:
            bw.write_signed(int(v), bps)
        s = samples.astype(np.int64)
        if o == 0:
            res = s
        elif o == 1:
            res = s[1:] - s[:-1]
        elif o == 2:
            res = s[2:] - 2 * s[1:-1] + s[:-2]
        else:
            raise ValueError("fixed_order <= 2 in this encoder")
        _write_residual_rice(bw, [int(r) for r in res], rice)
    else:
        raise ValueError(mode)


def encode_flac(
    channels: List[np.ndarray],
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    mode: str = "verbatim",
    rice: int = 4,
    fixed_order: int = 1,
) -> bytes:
    """Encode int16-range integer channel arrays into a FLAC stream."""
    n = len(channels[0])
    n_ch = len(channels)
    bw = BitWriter()
    bw.write(0x664C6143, 32)  # fLaC
    # STREAMINFO (last metadata block)
    bw.write(1, 1)
    bw.write(0, 7)
    bw.write(34, 24)
    bw.write(block_size, 16)
    bw.write(block_size, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(n_ch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n, 36)
    for _ in range(16):
        bw.write(0, 8)  # md5 (unverified)

    frame_idx = 0
    for start in range(0, n, block_size):
        bs = min(block_size, n - start)
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # blocksize: 16-bit value follows
        sr_code = {16000: 5, 44100: 9, 48000: 10}.get(sample_rate, 0)
        bw.write(sr_code, 4)
        bw.write(n_ch - 1, 4)  # independent channels
        bw.write(4, 3)  # 16-bit
        bw.write(0, 1)
        _utf8_number(bw, frame_idx)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 zero-filled (decoder consumes only)
        for ch in channels:
            _write_subframe(bw, ch[start : start + bs], bps, mode, rice,
                            fixed_order)
        bw.align()
        bw.write(0, 16)  # CRC-16 zero-filled
        frame_idx += 1

    return bytes(bw.bytes)
