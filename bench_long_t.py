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
    parser.add_argument("--seq_parallel", type=int, default=0,
                        help="N>0: run each length additionally under a "
                             "('data','seq') 1xN mesh with the frame axis "
                             "sharded (parallel/sequence.py) — the SP "
                             "long-T path with the per-shard flash kernel. "
                             "On the 1-chip bench host this exercises the "
                             "virtual CPU mesh (compile/correctness, not "
                             "perf); on an N-chip slice it measures.")
    args = parser.parse_args(argv)

    if args.seq_parallel:
        import jax as _jax

        if not _jax._src.xla_bridge._backends and args.seq_parallel > 1:
            # provision enough devices BEFORE backend init when the host
            # has a single chip (same technique as __graft_entry__)
            import os

            if os.environ.get("SLS_TPU_REAL_MULTICHIP") != "1":
                _jax.config.update("jax_platforms", "cpu")
                _jax.config.update(
                    "jax_num_cpu_devices", int(args.seq_parallel))

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
        if args.seq_parallel:
            from sls_tpu.parallel.mesh import replicate
            from sls_tpu.parallel.sequence import sp_mesh

            n = args.seq_parallel
            for name, flash in (("sp_xla", 0), ("sp_flash", t)):
                cfg = dataclasses.replace(
                    base, flash_long_t=flash, seq_axis="seq")
                model = XLSREncoder(cfg)
                mesh = sp_mesh(n, jax.devices()[:n], n_data=1)
                jfwd = jax.jit(
                    lambda p, w, model=model: jnp.sum(
                        model.apply({"params": p}, w, train=False))
                )
                with jax.sharding.set_mesh(mesh):
                    p_sp = replicate(params, mesh)
                    wav_sp = replicate(wav, mesh)

                def fwd(p, w, jfwd=jfwd, mesh=mesh,
                        p_sp=p_sp, wav_sp=wav_sp):
                    with jax.sharding.set_mesh(mesh):
                        return jfwd(p_sp, wav_sp)
                try:
                    t0 = time.time()
                    float(jax.device_get(fwd(params, wav)))
                    print(f"# T={t} {name}(n={n}): compile+first "
                          f"{time.time() - t0:.1f}s", file=sys.stderr)
                    start = time.time()
                    for _ in range(args.iters):
                        out = fwd(params, wav)
                    float(jax.device_get(out))
                    dt = (time.time() - start) / args.iters
                    row[name] = {
                        "ms_per_clip": round(1e3 * dt / args.batch, 1),
                        "clips_per_sec": round(args.batch / dt, 2),
                        "n_seq": n,
                    }
                except Exception as exc:
                    row[name] = {
                        "error": f"{type(exc).__name__}: {exc}"[:160]}

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
