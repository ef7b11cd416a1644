"""Per-program XLA compiler-option sweep on the flagship eval step.

The remaining eval-throughput gap (66% MFU at the b36 sweet spot,
49-52% elsewhere — docs/SPEED_OF_LIGHT.md) sits inside XLA's
fusion/layout choices, not in the step structure.  The image's TPU
plugin overrides XLA_FLAGS at process start (sitecustomize), so global
flags can't be swept — but per-program ``compiler_options`` on the AOT
path (``jit(f).lower(...).compile(compiler_options=...)``) bypass the
env entirely.  This sweeps a small set of plausible knobs and times
each compiled executable pipelined (relay methodology: dispatch N,
fetch only the last).

Unknown/rejected option names are reported per-variant, not fatal —
the flag namespace varies across libtpu versions.

One JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

VARIANTS = [
    ("baseline", {}),
    # scoped VMEM budget steers fusion aggressiveness / operand
    # residency; default on v5e is typically in the tens of MB
    ("vmem_16m", {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # latency-hiding scheduler: mostly collectives, but also reorders
    # copies/compute on a single chip
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # flatten while loops for scheduling (conv frontend has none in the
    # scan sense, but the option also affects fusion boundaries)
    ("license_to_fuse", {"xla_tpu_licm_size_inflation_ratio": "2"}),
]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=36)
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--only", type=str, default=None,
                        help="comma-separated variant names to run")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import build_flagship, flops_per_utterance, init_flagship

    model, cfg = build_flagship(pallas=True)
    forward, params, wav = init_flagship(model, args.batch)
    gflop = flops_per_utterance(cfg) / 1e9

    def fn(params, wav):
        return model.apply({"params": params}, wav, train=False)["score"]

    lowered = jax.jit(fn).lower(params, wav)
    only = set(args.only.split(",")) if args.only else None

    results = []
    for name, opts in VARIANTS:
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.time() - t0
            # warmup + pipelined timing (relay: only device_get syncs)
            for _ in range(args.warmup):
                out = compiled(params, wav)
            np.asarray(out)
            t0 = time.time()
            for _ in range(args.iters):
                out = compiled(params, wav)
            np.asarray(out)
            dt = (time.time() - t0) / args.iters
            utts = args.batch / dt
            rec = {
                "variant": name, "opts": opts,
                "ms_per_batch": round(dt * 1e3, 2),
                "utts_per_sec": round(utts, 1),
                "mfu": round(utts * gflop / 1e3 / 197.0, 4),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            rec = {"variant": name, "opts": opts,
                   "error": f"{type(e).__name__}: {e}"}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if "utts_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: r["utts_per_sec"])
        print(json.dumps({"best": best["variant"],
                          "utts_per_sec": best["utts_per_sec"]}),
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
