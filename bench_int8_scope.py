"""Flagship eval with int8_scope='ffn' (fc1/fc2 only) vs bf16 vs full
int8 — tests whether restricting dynamic quant to the wide FFN GEMMs
flips the end-to-end int8 result (bench_int8.py measured full int8 at
0.94x).  Same checkpoint serves all three paths."""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

import jax

from bench import build_flagship, init_flagship, time_pipelined
from sls_tpu.models.detector import Detector


def main() -> int:
    batch = 36
    model_fp, cfg = build_flagship()
    fwd_fp, params, wav = init_flagship(model_fp, batch)
    out = {"batch": batch}
    t_fp = time_pipelined(fwd_fp, params, wav)
    out["bf16_utts_per_sec"] = round(batch / t_fp, 1)

    for scope in ("ffn", "all"):
        cfg_q = dataclasses.replace(
            cfg, encoder=dataclasses.replace(
                cfg.encoder, int8_serving=True, int8_scope=scope))
        model_q = Detector(cfg_q)

        @jax.jit
        def fwd_q(params, wav, model_q=model_q):
            return model_q.apply(
                {"params": params}, wav, train=False)["score"]

        t0 = time.time()
        s_q = jax.device_get(fwd_q(params, wav))
        print(f"# {scope} compile+first-run {time.time() - t0:.1f}s",
              file=sys.stderr)
        assert np.all(np.isfinite(s_q))
        s_fp = jax.device_get(fwd_fp(params, wav))
        out[f"int8_{scope}_score_max_abs_diff"] = round(
            float(np.max(np.abs(s_q - s_fp))), 4)
        t_q = time_pipelined(fwd_q, params, wav)
        out[f"int8_{scope}_utts_per_sec"] = round(batch / t_q, 1)
        out[f"int8_{scope}_speedup"] = round(t_fp / t_q, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
