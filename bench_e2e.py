"""END-TO-END eval benchmark: FLAC files on disk -> scores in a file.

The headline bench (bench.py) times synthetic in-memory waveforms; this
one times the PRODUCTION path the reference runs per batch
(reference: data_utils_SSL.py:96-115 librosa decode + main.py:158-199
score loop): native C++ FLAC decode -> BatchLoader thread prefetch ->
host->device transfer -> flagship forward -> ScoreWriter, all
overlapped exactly like Trainer.produce_scores.

A synthetic corpus is generated once (tests/flac_encoder.py — the
dependency-free FLAC encoder used by the decoder's regression tests)
and cached; --n_utts index entries cycle over the unique files, so
decode work per utterance is real while generation stays cheap.

Also reports the component rates for bottleneck attribution:
  - decode-only: draining the BatchLoader with no device work
  - native-decode: the raw C++ decode_batch rate (loader overhead =
    the gap to decode-only)
  - upload: host->device transfer bandwidth for one batch
  - device-only: the bench.py number for the same batch size

On THIS image the chip sits behind a network relay whose ~14 MB/s
upload path binds the pipeline (measured r3: e2e 131 utts/s vs 380
decode-only, 752 native-decode, 860 device-only; explicit double-
buffered device_put does not help — the relay transfer engine is
already pipelined).  ``--wire_int16`` halves the wire bytes (native
int16 decode + on-device dequant, lossless for 16-bit sources):
measured e2e 244.9 utts/s (1.87x) with decode-only up to 816 utts/s
(docs/BENCH_NOTES_r3.json wire_int16).  On a production host
(PCIe >= 8 GB/s) the upload term vanishes and the binding constraint
is host decode, which scales with cores (n_threads).  The JSON
reports every component so the bottleneck is named, not guessed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

from bench import (
    BASELINE_UTTS_PER_SEC,
    build_flagship,
    flops_per_utterance,
    init_flagship,
)

WAV_LEN = 64600


def ensure_corpus(flac_dir: Path, n_unique: int, seed: int = 0) -> list:
    """Generate (once) and return n_unique 4-second FLAC files."""
    flac_dir.mkdir(parents=True, exist_ok=True)
    paths = [flac_dir / f"bench_{i:04d}.flac" for i in range(n_unique)]
    missing = [p for p in paths if not p.exists()]
    if missing:
        sys.path.insert(0, str(Path(__file__).parent))
        from scipy.signal import lfilter

        from tests.flac_encoder import encode_flac

        t0 = time.time()
        rng = np.random.default_rng(seed)
        for p in missing:
            x = lfilter([1.0], [1, -0.97], rng.normal(0, 1, WAV_LEN))
            pcm = (x / np.abs(x).max() * 12000).astype(np.int64)
            p.write_bytes(encode_flac([pcm], mode="fixed", rice=10,
                                      fixed_order=2))
        print(f"# generated {len(missing)} FLACs in {time.time()-t0:.0f}s",
              file=sys.stderr)
    return paths


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=36)
    parser.add_argument("--n_utts", type=int, default=2016)
    parser.add_argument("--n_unique", type=int, default=128)
    parser.add_argument("--flac_dir", default="/tmp/sls_e2e_flac")
    parser.add_argument("--num_threads", type=int, default=8)
    parser.add_argument("--out", default="/tmp/sls_e2e_scores.txt")
    parser.add_argument("--no_pallas", dest="pallas", action="store_false",
                        default=True)
    wiregrp = parser.add_mutually_exclusive_group()
    wiregrp.add_argument("--wire_int16", action="store_true",
                         help="upload int16 waveforms (half the bytes; "
                         "lossless for 16-bit FLAC — see pipeline.to_wire)")
    wiregrp.add_argument("--wire_mulaw", action="store_true",
                         help="upload 8-bit mu-law waveforms (quarter the "
                         "float32 bytes; LOSSY — data/mulaw.py, accuracy "
                         "gate in tests/test_mulaw.py)")
    args = parser.parse_args(argv)

    import jax

    from sls_tpu.data.pipeline import BatchLoader, DatasetIndex
    from sls_tpu.scores.writer import ScoreWriter

    paths = ensure_corpus(Path(args.flac_dir), args.n_unique)
    index = DatasetIndex(
        utt_ids=[f"E2E_{i:06d}" for i in range(args.n_utts)],
        paths=[paths[i % len(paths)] for i in range(args.n_utts)],
    )

    model, cfg = build_flagship(args.pallas)
    _, params, wav = init_flagship(model, args.batch)
    wire = ("mulaw" if args.wire_mulaw
            else "int16" if args.wire_int16 else "float32")

    # mirror the production eval step (train/steps.py make_eval_step):
    # dequantize the wire format INSIDE the jitted program — without
    # this an int16 batch reaches the conv 32768x scaled and the score
    # file is garbage (the float32 path compiles to a no-op)
    from sls_tpu.train.steps import dequantize_wire

    @jax.jit
    def forward(params, w):
        return model.apply(
            {"params": params}, dequantize_wire(w), train=False
        )["score"]

    if wire != "float32":
        from sls_tpu.data.pipeline import to_wire

        wav = to_wire(np.asarray(wav), wire)
    t0 = time.time()
    jax.device_get(forward(params, wav))  # compile outside the timing
    print(f"# compile+first-run {time.time() - t0:.1f}s", file=sys.stderr)

    def make_loader():
        return BatchLoader(index, args.batch, cut=WAV_LEN,
                           num_threads=args.num_threads, wire_dtype=wire)

    # component rate 1: decode-only (drain the loader, no device work)
    t0 = time.time()
    n_dec = sum(int(b.valid.sum()) for b in make_loader().epoch(0))
    decode_ups = n_dec / (time.time() - t0)
    print(f"# decode-only: {decode_ups:.1f} utts/s", file=sys.stderr)

    # component rate 2: raw native decode (no loader machinery)
    from sls_tpu.data.flac import decode_batch

    t0 = time.time()
    n_native = 0
    for i in range(0, min(args.n_utts, 360), args.batch):
        chunk = index.paths[i:i + args.batch]
        decode_batch(chunk, WAV_LEN, n_threads=4)
        n_native += len(chunk)
    native_ups = n_native / (time.time() - t0)
    print(f"# native-decode: {native_ups:.1f} utts/s", file=sys.stderr)

    # component rate 3: host->device upload bandwidth for one batch
    bytes_per = {"float32": 4, "int16": 2, "mulaw": 1}[wire]
    batch_bytes = args.batch * WAV_LEN * bytes_per
    up = np.asarray(wav)
    jax.device_put(up).block_until_ready()
    t0 = time.time()
    for i in range(4):
        jax.device_put(up + i).block_until_ready()
    up_s = (time.time() - t0) / 4
    upload_mbps = batch_bytes / up_s / 1e6
    print(f"# upload: {upload_mbps:.0f} MB/s "
          f"({args.batch / up_s:.1f} utts/s serial-equiv)", file=sys.stderr)

    # the e2e run: overlapped dispatch exactly like produce_scores
    # (loop.py) — while batch i computes, batch i+1 decodes on host
    # threads and batch i-1's scores are fetched + written
    t0 = time.time()
    n = 0
    with ScoreWriter(args.out) as w:
        pending = None
        for batch in make_loader().epoch(0):
            scores = forward(params, batch.wav)  # async dispatch
            if pending is not None:
                ids, valid, s = pending
                s = np.asarray(s)[valid]
                w.write_batch([u for u, ok in zip(ids, valid) if ok], s)
                n += int(valid.sum())
            pending = (batch.utt_ids, batch.valid, scores)
        ids, valid, s = pending
        s = np.asarray(s)[valid]
        w.write_batch([u for u, ok in zip(ids, valid) if ok], s)
        n += int(valid.sum())
    elapsed = time.time() - t0
    assert n == args.n_utts

    e2e_ups = n / elapsed
    gflop_utt = flops_per_utterance(cfg) / 1e9
    print(
        json.dumps(
            {
                "metric": "4s-utterances/sec/chip (e2e FLAC->scores)",
                "value": round(e2e_ups, 2),
                "unit": "utterances/sec/chip",
                "vs_baseline": round(e2e_ups / BASELINE_UTTS_PER_SEC, 2),
                "tflops": round(e2e_ups * gflop_utt / 1e3, 1),
                "decode_only_utts_per_sec": round(decode_ups, 1),
                "native_decode_utts_per_sec": round(native_ups, 1),
                "upload_MB_per_sec": round(upload_mbps, 1),
                "wire": wire,
                "n_utts": n,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
