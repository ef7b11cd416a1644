"""Close the bf16-LN-IO question with a measurement (VERDICT r3 #8).

The r2 lever list flagged "fp32 LN islands" as a possible ~2-3 ms/batch
saving; SPEED_OF_LIGHT.md §forward killed it by INSPECTION (Fp32LayerNorm
reads bf16 and writes bf16 — the fp32 is compute-format only inside the
fused normalize kernel).  This replaces the inspection with a number:
time a chain of 50 LayerNorms (the flagship forward has 24 layers × 2 +
extractor/final ≈ 50 LN instances) at the production activation shape
[36·202, 1024] in three flavors:

  fp32-compute  — the production Fp32LayerNorm recipe (bf16 IO, fp32 math)
  bf16-compute  — LN computed natively in bf16 (the hypothetical "win")
  fp32-IO       — fp32-resident tensors (the strawman the inspection
                   argument says we are NOT paying for)

Chained through a data dependency (x <- LN(x) + 1e-3·x) so XLA cannot
CSE the repeats.  Pipelined dispatch, fetch-last (relay methodology,
bench.py).  Emits one JSON line for BENCH_NOTES_r4.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

B, T, C = 36, 202, 1024
N_LN = 50


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=32)
    parser.add_argument("--warmup", type=int, default=4)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    x_host = rng.normal(0, 1, size=(B * T, C)).astype(np.float32)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def ln(x, compute_dtype):
        xf = x.astype(compute_dtype)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        y = y * scale.astype(compute_dtype) + bias.astype(compute_dtype)
        return y.astype(x.dtype)

    def chain(x0, compute_dtype):
        def body(_, x):
            return ln(x, compute_dtype) + 1e-3 * x

        return jax.lax.fori_loop(0, N_LN, body, x0)

    flavors = {
        "fp32_compute_bf16_io": (jnp.bfloat16, jnp.float32),
        "bf16_compute_bf16_io": (jnp.bfloat16, jnp.bfloat16),
        "fp32_compute_fp32_io": (jnp.float32, jnp.float32),
    }

    results = {}
    for name, (io_dtype, compute_dtype) in flavors.items():
        x = jnp.asarray(x_host, io_dtype)
        fn = jax.jit(lambda x0, cd=compute_dtype: chain(x0, cd))
        jax.device_get(fn(x))  # compile
        for _ in range(args.warmup):
            jax.device_get(fn(x))
        t0 = time.time()
        out = None
        for _ in range(args.iters):
            out = fn(x)
        np.asarray(jax.device_get(out))
        dt = (time.time() - t0) / args.iters
        results[name] = round(dt * 1e3, 3)  # ms per 50-LN chain
        print(f"# {name}: {results[name]} ms / {N_LN} LNs", file=sys.stderr)

    delta_ms = results["fp32_compute_bf16_io"] - results["bf16_compute_bf16_io"]
    print(json.dumps({
        "metric": "LN-stack ms/forward (50 LNs @ [36*202,1024])",
        "value": results["fp32_compute_bf16_io"],
        "unit": "ms",
        "vs_baseline": 0,
        "flavors_ms": results,
        "bf16_compute_saving_ms_per_batch": round(delta_ms, 3),
        "note": "positive saving = switching LN compute to bf16 would "
                "win that many ms per b36 forward; the fp32-IO row is "
                "the cost the current design already avoids",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
