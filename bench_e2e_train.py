"""END-TO-END train benchmark: FLAC files on disk -> optimizer steps.

VERDICT r4 #2: the train hot loop — native C++ FLAC decode -> wire ->
device RawBoost -> jitted train step (reference hot loop
main.py:201-258; SURVEY §7 flags host-bound decode as the #1
throughput risk) — had never been measured end-to-end; the r2 "epoch
on chip" was 10 synthetic steps.  This drives the REAL production
path: ``train.loop.Trainer.train_epoch`` over a synthetic FLAC corpus
through a thread-prefetched ``BatchLoader``, so every per-step cost the
production loop pays (pad, upload, on-device RawBoost, per-step metric
fetch, score accumulation) is in the measurement — if the overlap story
is broken, this number says so before a pod run does.

Component rates are reported alongside (decode-only drain and the
synthetic-input device-only rate from bench_train.run_config) so the
bottleneck is named: on this 1-core relay image the expected order is
device-only ≈ 215 utts/s (b112) with decode-only ~800 utts/s/core —
host margin ~4x, but the wire upload (b64 int16 ≈ 8.3 MB/step through
a 27-38 MB/s relay) can bind below the device rate.  A production host
(many cores, PCIe) keeps the same code path with both terms off the
critical path.

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

from bench_e2e import WAV_LEN, ensure_corpus


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--steps", type=int, default=200,
                        help="train steps to sustain (>=200 per the "
                        "evidence bar; n_utts = steps * batch)")
    parser.add_argument("--n_unique", type=int, default=128)
    parser.add_argument("--flac_dir", default="/tmp/sls_e2e_flac")
    parser.add_argument("--num_threads", type=int, default=8)
    parser.add_argument("--wire", default="int16",
                        choices=["float32", "int16", "mulaw"])
    parser.add_argument("--rawboost_algo", type=int, default=3,
                        help="RawBoost algo (reference default 3 = "
                        "series 1+2; 0 disables augmentation)")
    parser.add_argument("--freeze", action="store_true",
                        help="frozen-SSL SAE training mode")
    parser.add_argument("--warm_steps", type=int, default=3,
                        help="untimed leading steps (compile + loader "
                        "ramp) — run as a separate short epoch")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sls_tpu.config import (
        ExperimentConfig, ModelConfig, RawBoostConfig, SAEConfig,
        TrainConfig, XLSRConfig,
    )
    from sls_tpu.data.pipeline import BatchLoader, DatasetIndex
    from sls_tpu.train.loop import Trainer

    paths = ensure_corpus(Path(args.flac_dir), args.n_unique)
    n_utts = args.steps * args.batch
    rng = np.random.default_rng(0)
    index = DatasetIndex(
        utt_ids=[f"T_{i:06d}" for i in range(n_utts)],
        paths=[paths[i % len(paths)] for i in range(n_utts)],
        labels=rng.integers(0, 2, n_utts).astype(np.int64),
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            encoder=XLSRConfig(dtype=jnp.bfloat16),
            use_sae=True,
            use_sparse_features=True,
            freeze_encoder=args.freeze,
            sae=SAEConfig(activation_dim=1024, dict_size=4096, k=128),
        ),
        train=TrainConfig(
            batch_size=args.batch, lr=1e-6,
            rawboost=RawBoostConfig(algo=args.rawboost_algo),
        ),
    )

    def make_loader(n):
        sub = DatasetIndex(index.utt_ids[:n], index.paths[:n],
                           index.labels[:n])
        return BatchLoader(sub, args.batch, cut=WAV_LEN,
                           num_threads=args.num_threads,
                           wire_dtype=args.wire)

    # component rate: decode-only loader drain (host-side ceiling)
    t0 = time.time()
    n_dec = sum(int(b.valid.sum())
                for b in make_loader(min(n_utts, 1024)).epoch(0))
    decode_ups = n_dec / (time.time() - t0)
    print(f"# decode-only: {decode_ups:.1f} utts/s", file=sys.stderr)

    with tempfile.TemporaryDirectory() as run_dir:
        trainer = Trainer(cfg, run_dir, tensorboard=False)
        trainer.init_state(np.zeros((2, WAV_LEN), np.float32))

        t0 = time.time()
        trainer.train_epoch(make_loader(args.warm_steps * args.batch), 0)
        print(f"# compile+warm ({args.warm_steps} steps) "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

        t0 = time.time()
        metrics = trainer.train_epoch(make_loader(n_utts), 1)
        elapsed = time.time() - t0

    ups = n_utts / elapsed
    mode = "frozen-SSL SAE" if args.freeze else "fine-tune"
    print(json.dumps({
        "metric": f"train-utts/sec/chip (e2e FLAC->train step, {mode})",
        "value": round(ups, 2),
        "unit": "utterances/sec/chip",
        "steps": args.steps,
        "batch": args.batch,
        "wire": args.wire,
        "rawboost_algo": args.rawboost_algo,
        "decode_only_utts_per_sec": round(decode_ups, 1),
        "wire_MB_per_step": round(
            args.batch * WAV_LEN
            * {"float32": 4, "int16": 2, "mulaw": 1}[args.wire] / 1e6, 2),
        "final_loss": round(float(metrics.loss), 4),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
