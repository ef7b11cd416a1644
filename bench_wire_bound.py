"""Flagship-width accuracy bound for the lossy/lossless wire formats.

VERDICT r4 #3: int8 serving carries a real-width score-shift bound
(max |Δscore| 0.0105, BENCH_NOTES_r3 int8_serving) plus a trained-tiny
EER gate; the μ-law wire — a LOSSY option advertised at 1.50–1.64× —
had only the tiny-model gate.  This runs the exact experiment that
produced the int8 bound, for every wire format: the real 24L/1024
topology with random init on the chip, the same audio through the
float32 wire vs the int16/μ-law wires (encode on host → dequantize
in-step, the production path train/steps.dequantize_wire), and reports
max |ΔP(bonafide)| over ``--batches`` × ``--batch`` utterances.

Notes on inputs: RMS-0.1 gaussian audio (the bench-wide synthetic
signal).  μ-law error grows toward small amplitudes relative to peak —
gaussian audio exercises the compander's full range.  int16 is exactly
lossless only for sources that ARE 16-bit quantized (all ASVspoof
corpora); random float32 audio rounds by ≤ half an LSB, so the int16
row here is an upper bound for real corpora, not zero.

Prints one JSON line per wire format plus a summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from bench import build_flagship, setup_compile_cache


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=36)
    parser.add_argument("--batches", type=int, default=4,
                        help="independent audio batches per wire (the "
                        "bound is a max over batches*batch utterances)")
    parser.add_argument("--wav_len", type=int, default=64600)
    args = parser.parse_args(argv)

    setup_compile_cache()
    import jax
    import jax.numpy as jnp

    from sls_tpu.data.pipeline import to_wire
    from sls_tpu.train.steps import dequantize_wire

    model, cfg = build_flagship()
    rng = np.random.default_rng(0)
    wav0 = jnp.asarray(rng.normal(
        0, 0.1, size=(args.batch, args.wav_len)).astype(np.float32))
    t0 = time.time()
    init_fn = jax.jit(lambda key: model.init(key, wav0[:1], train=False))
    params = init_fn(jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)
    print(f"# init {time.time() - t0:.1f}s", file=sys.stderr)

    @jax.jit
    def forward(params, wav):
        logp = model.apply(
            {"params": params}, dequantize_wire(wav), train=False
        )["log_probs"]
        # the repo-wide score contract (train/loop.py produce_scores)
        return jnp.exp(jnp.minimum(logp, 0.0))[:, 1]

    results = {}
    for wire in ("int16", "mulaw"):
        max_d, max_ref_spread = 0.0, 0.0
        for b in range(args.batches):
            wav = rng.normal(
                0, 0.1, size=(args.batch, args.wav_len)).astype(np.float32)
            ref = np.asarray(forward(params, jnp.asarray(wav)), np.float64)
            wired = jnp.asarray(to_wire(wav, wire))
            got = np.asarray(forward(params, wired), np.float64)
            max_d = max(max_d, float(np.max(np.abs(got - ref))))
            max_ref_spread = max(
                max_ref_spread, float(ref.max() - ref.min()))
        results[wire] = max_d
        print(json.dumps({
            "metric": f"wire score shift ({wire}, flagship width)",
            "value": max_d,
            "unit": "max |dP(bonafide)| vs float32 wire",
            "utts": args.batch * args.batches,
            "ref_score_spread": max_ref_spread,
        }), flush=True)

    # context line: how the bounds sit against the recorded int8 bound
    print(json.dumps({
        "metric": "wire bounds summary",
        "int16": results["int16"],
        "mulaw": results["mulaw"],
        "int8_ffn_recorded": 0.0105,
        "note": "go/no-go rule extends to wires: a lossy wire may serve "
        "a checkpoint only after the held-out delta-EER=0/zero-flip "
        "gate passes on THAT checkpoint (tests/test_mulaw.py encodes "
        "the tiny-model gate; this is the width bound)",
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
