"""SLS-family component attribution: where do the 20 ms/batch vs the
flagship go?

r4's first SLS measurement (574 utts/s = 43.4% MFU at b36 vs the
flagship's 848 = 65.6%) needs an attribution before optimizing.  Splits
the forward into:

  enc_plain    — encoder WITHOUT hidden-state collection (flagship's path)
  enc_hiddens  — encoder WITH return_hidden_states (25 stacks exposed)
  sls_full     — encoder + SLSHead (gates, fused sum, BN/SELU/pool, MLP)

so (enc_hiddens - enc_plain) prices the layer_results exposure and
(sls_full - enc_hiddens) prices the head itself.  Pipelined dispatch,
fetch-last (bench.py methodology).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=36)
    parser.add_argument("--iters", type=int, default=12)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sls_tpu.config import ModelConfig, XLSRConfig
    from sls_tpu.encoder.xlsr import XLSREncoder
    from sls_tpu.models.sls import SLSDetector

    cfg = ModelConfig(encoder=XLSRConfig(dtype=jnp.bfloat16), use_sae=False)
    enc = XLSREncoder(cfg.encoder)
    det = SLSDetector(cfg)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.normal(0, 0.1, (args.batch, 64600)).astype(np.float32))

    init = jax.jit(lambda key: det.init(key, wav[:1], train=False))
    variables = init(jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    enc_params = params["encoder"]
    jax.block_until_ready(params)

    def enc_plain(p, w):
        return jnp.sum(enc.apply({"params": p}, w, train=False))

    def enc_hiddens(p, w):
        final, hiddens = enc.apply(
            {"params": p}, w, train=False, return_hidden_states=True)
        return sum(jnp.sum(h) for h in hiddens) + jnp.sum(final)

    def sls_full(p, bs, w):
        return jnp.sum(det.apply(
            {"params": p, "batch_stats": bs}, w, train=False)["score"])

    cases = {
        "enc_plain": (jax.jit(enc_plain), (enc_params, wav)),
        "enc_hiddens": (jax.jit(enc_hiddens), (enc_params, wav)),
        "sls_full": (jax.jit(sls_full), (params, batch_stats, wav)),
    }
    out = {}
    for name, (fn, fargs) in cases.items():
        t0 = time.time()
        float(jax.device_get(fn(*fargs)))
        print(f"# {name} compile+first {time.time() - t0:.1f}s",
              file=sys.stderr)
        for _ in range(3):
            jax.device_get(fn(*fargs))
        start = time.time()
        for _ in range(args.iters):
            o = fn(*fargs)
        float(jax.device_get(o))
        dt = (time.time() - start) / args.iters
        out[name] = round(1e3 * dt, 2)
        print(f"# {name}: {out[name]} ms/batch", file=sys.stderr)

    out["hiddens_exposure_ms"] = round(out["enc_hiddens"] - out["enc_plain"], 2)
    out["head_ms"] = round(out["sls_full"] - out["enc_hiddens"], 2)
    print(json.dumps({
        "metric": "sls component attribution (ms/batch)",
        "batch": args.batch,
        **out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
