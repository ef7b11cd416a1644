"""Benchmark sweep: batch size x pallas-kernels x remat on the flagship.

Companion to bench.py for perf iteration on real hardware.  Prints one
JSON line per configuration (same schema as bench.py plus the config) —
run on a TPU chip to pick the production batch size and kernel toggles.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_config(batch: int, use_pallas: bool, remat: bool, iters: int = 6):
    import jax
    import jax.numpy as jnp

    from sls_tpu.config import ModelConfig, SAEConfig, XLSRConfig
    from sls_tpu.models.detector import Detector

    cfg = ModelConfig(
        encoder=XLSRConfig(dtype=jnp.bfloat16, remat=remat),
        sae=SAEConfig(activation_dim=1024, dict_size=4096, k=128,
                      use_pallas=use_pallas),
    )
    model = Detector(cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.1, (batch, 64600)).astype(np.float32))

    params = jax.jit(lambda k: model.init(k, wav[:1], train=False))(
        jax.random.PRNGKey(0)
    )["params"]

    @jax.jit
    def fwd(p, w):
        return model.apply({"params": p}, w, train=False)["score"]

    jax.device_get(fwd(params, wav))  # compile + warm
    jax.device_get(fwd(params, wav))
    start = time.time()
    for _ in range(iters):
        scores = jax.device_get(fwd(params, wav))
    elapsed = time.time() - start
    assert np.all(np.isfinite(scores))
    return batch * iters / elapsed


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[16, 32, 64, 128])
    parser.add_argument("--pallas", action="store_true",
                        help="also sweep the fused pallas SAE kernels")
    args = parser.parse_args(argv)

    for batch in args.batches:
        for use_pallas in ([False, True] if args.pallas else [False]):
            try:
                ups = run_config(batch, use_pallas, remat=False)
                print(json.dumps({
                    "metric": "4s-utterances/sec/chip (XLS-R-300M eval)",
                    "value": round(ups, 2),
                    "unit": "utterances/sec/chip",
                    "batch": batch,
                    "pallas_sae": use_pallas,
                }), flush=True)
            except Exception as exc:  # OOM etc: record and continue
                print(json.dumps({
                    "batch": batch, "pallas_sae": use_pallas,
                    "error": f"{type(exc).__name__}: {exc}"[:200],
                }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
