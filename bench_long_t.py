"""Long-sequence attention measurement: VMEM kernel vs XLA einsum.

Runs the full XLS-R-300M encoder forward at un-windowed full-utterance
lengths (T in frames; 1280 ~ 25.6 s audio, 2560 ~ 51 s) with attention
routed through kernels/flash_attention.py vs XLA's einsum path, and
prints utts/s + ms/clip for each.  This is the measurement VERDICT r2
asked for before keeping the long-T kernel (the T=201 kernels were
measured slower and are flag-gated off; this path is where score
materialization actually dominates).

Pipelined timing with a scalar host fetch (relay-safe, see bench.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--t_frames", type=int, nargs="+",
                        default=[1280, 2560])
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=6)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sls_tpu.config import XLSRConfig
    from sls_tpu.encoder.xlsr import XLSREncoder
    from sls_tpu.evaluation.overlap import length_buckets

    base = XLSRConfig(dtype=jnp.bfloat16, flash_long_t=0)
    buckets = length_buckets(base, t_targets=tuple(args.t_frames))

    enc = XLSREncoder(base)
    init = jax.jit(lambda key: enc.init(key, jnp.zeros((1, 4000))))
    params = init(jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)

    results = {}
    for t in args.t_frames:
        wav = jnp.asarray(
            np.random.default_rng(0)
            .normal(0, 0.1, (args.batch, buckets[t]))
            .astype(np.float32)
        )
        row = {}
        for name, flash in (("xla", 0), ("flash", t)):
            cfg = dataclasses.replace(base, flash_long_t=flash)
            model = XLSREncoder(cfg)

            @jax.jit
            def fwd(p, w, model=model):
                return jnp.sum(model.apply({"params": p}, w, train=False))

            try:
                t0 = time.time()
                float(jax.device_get(fwd(params, wav)))
                print(f"# T={t} {name}: compile+first "
                      f"{time.time() - t0:.1f}s", file=sys.stderr)
                start = time.time()
                for _ in range(args.iters):
                    out = fwd(params, wav)
                float(jax.device_get(out))
                dt = (time.time() - start) / args.iters
                row[name] = {
                    "ms_per_clip": round(1e3 * dt / args.batch, 1),
                    "clips_per_sec": round(args.batch / dt, 2),
                }
            except Exception as exc:  # OOM at long T is a result too
                row[name] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        if "ms_per_clip" in row.get("xla", {}) and \
           "ms_per_clip" in row.get("flash", {}):
            row["flash_speedup"] = round(
                row["xla"]["ms_per_clip"] / row["flash"]["ms_per_clip"], 3)
        results[f"T={t}"] = row
        print(f"# {t}: {row}", file=sys.stderr)

    print(json.dumps({"metric": "long-T encoder forward", **results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
