"""Measure the int8 dynamic-quantized serving path on the real chip.

Two measurements, both with the device_get-forced timing used everywhere
in this repo (block_until_ready returns early on the axon relay):

1. raw MXU rate: square-matmul TFLOP/s, int8xint8->int32 vs bf16 — the
   hardware ceiling the quantized path is chasing (v5e datasheet: int8
   394 TOP/s vs bf16 197 TFLOP/s, i.e. 2x peak; realized ratio is lower
   because the int8 path spends fp32 quantize/rescale bandwidth).
2. end-to-end flagship eval: the full Detector (XLS-R-300M + SAE + head)
   with XLSRConfig.int8_serving on vs off, same batch as bench.py.

Writes results to stdout as JSON; paste into docs/BENCH_NOTES_r3.json
under "int8_serving".
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import (build_flagship, flops_per_utterance, init_flagship,
                   time_pipelined)


def raw_matmul(n: int = 8192, iters: int = 8):
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (n, n)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (n, n)).astype(np.int8))
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    @jax.jit
    def mm_i8(a, b):
        # sum only, to return a tiny fetchable payload
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32).sum()

    @jax.jit
    def mm_bf16(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32).sum()

    flop = 2.0 * n * n * n
    t_i8 = time_pipelined(mm_i8, a8, b8, iters=iters, warmup=2)
    t_bf = time_pipelined(mm_bf16, ab, bb, iters=iters, warmup=2)
    return {
        "n": n,
        "int8_tflops": round(flop / t_i8 / 1e12, 1),
        "bf16_tflops": round(flop / t_bf / 1e12, 1),
        "ratio": round(t_bf / t_i8, 2),
    }


def flagship(batch: int = 36, iters: int = 16):
    import dataclasses

    out = {}
    model_fp, cfg = build_flagship()
    fwd_fp, params, wav = init_flagship(model_fp, batch)
    gflop = flops_per_utterance(cfg) / 1e9

    t_fp = time_pipelined(fwd_fp, params, wav, iters=iters, warmup=3)
    out["bf16_utts_per_sec"] = round(batch / t_fp, 1)

    # explicit FULL scope: build_flagship pins int8_scope='ffn' (the
    # serving default), but this script's documented measurement — and
    # the 0.94x negative result recorded in BENCH_NOTES_r3 — is the
    # all-matmuls configuration; bench_int8_scope.py compares the two
    cfg_q = dataclasses.replace(
        cfg, encoder=dataclasses.replace(
            cfg.encoder, int8_serving=True, int8_scope="all"))
    from sls_tpu.models.detector import Detector

    model_q = Detector(cfg_q)

    @jax.jit
    def fwd_q(params, wav):
        return model_q.apply({"params": params}, wav, train=False)["score"]

    # same checkpoint serves both paths — prove it here by reusing params
    t0 = time.time()
    s_q = jax.device_get(fwd_q(params, wav))
    print(f"# int8 compile+first-run {time.time() - t0:.1f}s",
          file=sys.stderr)
    s_fp = jax.device_get(fwd_fp(params, wav))
    out["score_max_abs_diff"] = round(
        float(np.max(np.abs(s_q - s_fp))), 4)

    t_q = time_pipelined(fwd_q, params, wav, iters=iters, warmup=3)
    out["int8_utts_per_sec"] = round(batch / t_q, 1)
    out["speedup"] = round(t_fp / t_q, 2)
    out["batch"] = batch
    out["int8_tflops_bf16_equivalent"] = round(
        gflop / 1e3 * (batch / t_q), 1)
    return out


def main() -> int:
    res = {"raw_mxu": raw_matmul(), "flagship_eval": flagship()}
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
