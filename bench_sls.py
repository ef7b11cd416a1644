"""Eval throughput of the SECOND model family: XLS-R + SLS head.

bench.py covers the flagship TopK-SAE detector; this measures the
upstream SLS (layer-stack / Sensitive Layer Selection) architecture
(models/sls.py — BASELINE config #1, the reference's published
1.92% DF EER model: /root/reference/model.py SLS path + README.md).

The SLS head consumes ALL per-layer hidden states instead of the
final layer only, so its cost profile differs from the flagship:
same 24-layer encoder FLOPs plus the layer-gated fusion head.  After
the r4 root-cause fix (per-layer fused gate pooling + compute-dtype
fc1; BENCH_NOTES_r4 sls_head_root_cause) the head adds ~2.5 ms/batch
and the family serves at flagship throughput (853.5 utts/s at b36,
64.5% MFU) — worth its own measured number so serving either family
is a known quantity.

Same methodology as bench.py (pipelined dispatch, fetch-last), same
JSON-line output contract.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from bench import BASELINE_UTTS_PER_SEC, V5E_BF16_PEAK_TFLOPS, flops_per_utterance


def build_sls(int8_ffn: bool = False):
    import jax.numpy as jnp

    from sls_tpu.config import ModelConfig, XLSRConfig
    from sls_tpu.models.sls import SLSDetector

    cfg = ModelConfig(
        encoder=XLSRConfig(dtype=jnp.bfloat16, int8_serving=int8_ffn,
                           int8_scope="ffn"),
        use_sae=False,
        freeze_encoder=False,  # eval: no gradients either way
    )
    return SLSDetector(cfg), cfg


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=36)
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--int8", action="store_true",
                        help="dynamic int8 FFN GEMMs in the shared "
                        "encoder (the measured-best serving scope, "
                        "BENCH_NOTES_r3 int8_serving); opt-in so the "
                        "tracked series stays bf16 like bench.py")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    model, cfg = build_sls(int8_ffn=args.int8)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.normal(0, 0.1, size=(args.batch, 64600)).astype(np.float32)
    )
    t0 = time.time()
    init_fn = jax.jit(lambda key: model.init(key, wav[:1], train=False))
    variables = init_fn(jax.random.PRNGKey(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    jax.block_until_ready(params)
    print(f"# init {time.time() - t0:.1f}s", file=sys.stderr)

    @jax.jit
    def forward(params, batch_stats, wav):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, wav,
            train=False,
        )["score"]

    t0 = time.time()
    first = jax.device_get(forward(params, batch_stats, wav))
    print(f"# compile+first-run {time.time() - t0:.1f}s", file=sys.stderr)
    assert np.all(np.isfinite(first)), "non-finite scores"
    for _ in range(args.warmup):
        jax.device_get(forward(params, batch_stats, wav))

    start = time.time()
    for _ in range(args.iters):
        scores = forward(params, batch_stats, wav)
    final = jax.device_get(scores)
    elapsed = time.time() - start
    assert np.all(np.isfinite(final))

    utts_per_sec = args.batch * args.iters / elapsed
    # encoder FLOPs dominate and are shared with the flagship; the SLS
    # head adds <2% (per-layer 1024->1 gates + pooled classifier), so
    # the flagship analytic count is a faithful lower bound here
    gflop_utt = flops_per_utterance(cfg) / 1e9
    tflops = utts_per_sec * gflop_utt / 1e3
    out = {
        "metric": ("4s-utterances/sec/chip (XLS-R-300M + SLS head eval, int8-ffn)"
                   if args.int8 else
                   "4s-utterances/sec/chip (XLS-R-300M + SLS head eval)"),
        "value": round(utts_per_sec, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utts_per_sec / BASELINE_UTTS_PER_SEC, 2),
        "tflops": round(tflops, 1),
        "batch": args.batch,
    }
    # under int8 the FFN GEMMs are not bf16, so the ratio to the bf16
    # peak is a labeled bf16-equivalent, not MFU (same rule as bench.py)
    key = "mfu_bf16_equiv" if args.int8 else "mfu"
    out[key] = round(tflops / V5E_BF16_PEAK_TFLOPS, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
