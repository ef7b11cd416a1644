"""Online-serving bench: the batching engine under load on the chip.

Measures what the offline benches can't: request LATENCY under dynamic
batching.  Drives the engine directly (no HTTP: the bench image has
one CPU core, so a socket layer would measure Python, not the serving
path; the HTTP layer is covered functionally in tests/test_serve.py).

Two load shapes:

- closed-loop (default): N client threads submit-and-wait — measures
  the latency/throughput frontier at a fixed concurrency.
- open-loop (--rate R): submissions arrive at R utts/s regardless of
  completions — measures latency at a production-like arrival process.

Axon-relay caveat (docs/BENCH_NOTES_r2 methodology): every batch fetch
rides the relay's ~29 ms dispatch floor, so LATENCY numbers here carry
a fixed +29 ms that a production host (direct PCIe) would not pay;
throughput pipelines through it and is representative.

One JSON line per configuration, same convention as bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np


def build_serving_forward(batch: int, int8: bool, wav_len: int = 64600):
    """(score_fn, step, params): jitted (wav [B,cut]) -> log_probs [B,2]
    on flagship topology with random params (serving-path shape/speed is
    param-value independent)."""
    import jax

    from bench import build_flagship, init_flagship

    from sls_tpu.train.steps import dequantize_wire

    model, cfg = build_flagship(pallas=True, int8_ffn=int8)
    _, params, _ = init_flagship(model, batch, wav_len)

    # params must be a jit ARGUMENT, not a closure capture: captured
    # device arrays become compile-time constants, and constant-folding
    # 300M parameters stalls XLA for minutes (same mechanism as the r4
    # sls_head_root_cause finding, BENCH_NOTES_r4)
    @jax.jit
    def step(params, wav):
        out = model.apply(
            {"params": params}, dequantize_wire(wav), train=False
        )
        return out["log_probs"]

    return (lambda wav: step(params, wav)), step, params


def run_closed_loop(engine, pool, n_clients: int, duration_s: float):
    """N threads submit-and-wait for duration_s; returns per-request
    latencies (ms) and achieved throughput."""
    stop = time.monotonic() + duration_s
    lat_lock = threading.Lock()
    lats: list = []

    def client(idx: int):
        i = idx
        while time.monotonic() < stop:
            wav = pool[i % len(pool)]
            t0 = time.monotonic()
            engine.score(wav, timeout=120)
            with lat_lock:
                lats.append((time.monotonic() - t0) * 1e3)
            i += n_clients

    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(n_clients)
    ]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t_start
    return np.asarray(lats), len(lats) / elapsed


def run_open_loop(engine, pool, rate: float, duration_s: float):
    """Submit at a fixed rate; returns latencies and completion rate."""
    futures = []
    n = int(rate * duration_s)
    period = 1.0 / rate
    t_start = time.monotonic()
    for i in range(n):
        target = t_start + i * period
        delay = target - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        t0 = time.monotonic()
        futures.append((t0, engine.submit(pool[i % len(pool)])))
    for _, f in futures:
        f.result(300)
    elapsed = time.monotonic() - t_start
    # latency percentiles come from the engine's own per-request record
    # (submit -> flush), which is what a caller observes
    return engine.stats(), n / elapsed


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=36,
                   help="engine dispatch batch (36 = bench.py sweet spot)")
    p.add_argument("--max_wait_ms", type=float, default=8.0)
    p.add_argument("--int8", action="store_true",
                   help="int8-ffn serving GEMMs (the serving config)")
    p.add_argument("--wire", choices=("float32", "int16", "mulaw"),
                   default="int16",
                   help="mulaw = 1 byte/sample (lossy, data/mulaw.py) for "
                        "wire-bandwidth-bound links like the bench relay")
    p.add_argument("--clients", type=int, default=72,
                   help="closed-loop concurrency (2x batch keeps one "
                        "batch assembling while one is in flight)")
    p.add_argument("--rate", type=float, default=0.0,
                   help="open-loop arrival rate (utts/s); 0 = closed loop")
    p.add_argument("--buckets", default=None,
                   help="comma-separated smaller batch shapes for partial "
                        "dispatch (engine bucket_sizes), e.g. '9,18'")
    p.add_argument("--duration", type=float, default=20.0)
    p.add_argument("--pool", type=int, default=64,
                   help="distinct synthetic utterances cycled as requests")
    p.add_argument("--zero_wire", action="store_true",
                   help="engine-overhead isolation (VERDICT r4 #6): "
                   "score_fn ignores the assembled batch and scores a "
                   "pre-staged DEVICE-RESIDENT array, so the host->"
                   "device wire term vanishes while every engine cost "
                   "(queueing, assembly, row stacking, to_wire, future "
                   "resolution, stats) stays. Reports engine_overhead_"
                   "ms_per_batch vs a same-session raw pipelined "
                   "control of the identical program")
    args = p.parse_args(argv)

    import jax

    from sls_tpu.serve.engine import BatchingEngine

    print(f"# building flagship (batch={args.batch}, int8={args.int8})",
          file=sys.stderr, flush=True)
    forward, step, params = build_serving_forward(args.batch, args.int8)
    rng = np.random.default_rng(0)
    pool = [
        rng.normal(0, 0.1, size=64600).astype(np.float32)
        for _ in range(args.pool)
    ]

    raw_ms_per_batch = None
    if args.zero_wire:
        from bench import time_pipelined

        from sls_tpu.data.pipeline import to_wire

        staged = jax.device_put(to_wire(
            np.stack(pool[:args.batch]), args.wire))
        # same-session raw control: the exact program the engine will
        # dispatch, timed pipelined with zero engine machinery
        raw_s = time_pipelined(step, params, staged, iters=16, warmup=3)
        raw_ms_per_batch = raw_s * 1e3
        print(f"# raw control: {raw_ms_per_batch:.1f} ms/batch "
              f"({args.batch / raw_s:.1f} utts/s)",
              file=sys.stderr, flush=True)
        forward = lambda wav: step(params, staged)  # noqa: E731

    buckets = (tuple(int(b) for b in args.buckets.split(","))
               if args.buckets else None)
    engine = BatchingEngine(
        forward, args.batch, cut=64600,
        max_wait_ms=args.max_wait_ms, wire_dtype=args.wire,
        bucket_sizes=buckets,
    ).start()
    try:
        # warmup: one full batch through the engine (compile already
        # cached by init; this warms the engine + wire path), plus one
        # compile per bucket shape
        t0 = time.monotonic()
        warm = [engine.submit(pool[i % len(pool)])
                for i in range(args.batch)]
        for f in warm:
            f.result(600)
        from sls_tpu.data.pipeline import to_wire

        for s in buckets or ():
            np.asarray(forward(to_wire(
                np.zeros((s, 64600), np.float32), args.wire)))
        print(f"# warmup {time.monotonic() - t0:.1f}s "
              f"({engine.stats().batches} batches)",
              file=sys.stderr, flush=True)
        # warmup requests carry compile-time latencies (observed 149.8 s
        # at p95 in the open-loop record); measure from a clean slate
        engine.reset_stats()

        if args.rate > 0:
            st, thr = run_open_loop(engine, pool, args.rate, args.duration)
            lat = {"p50": st.p50_ms, "p95": st.p95_ms, "p99": st.p99_ms}
        else:
            lats, thr = run_closed_loop(
                engine, pool, args.clients, args.duration)
            p50, p95, p99 = np.percentile(lats, [50, 95, 99])
            lat = {"p50": float(p50), "p95": float(p95), "p99": float(p99)}
        st = engine.stats()
        out = {
            "metric": ("serving-throughput (flagship, engine zero-wire)"
                       if args.zero_wire else
                       "serving-throughput (flagship, dynamic batching)"),
            "value": round(thr, 1),
            "unit": "utterances/sec/chip",
            "latency_ms": {k: round(v, 1) for k, v in lat.items()},
            "mean_batch_fill": round(st.mean_fill, 3),
            "batches": st.batches,
            "config": {
                "batch": args.batch, "max_wait_ms": args.max_wait_ms,
                "int8": args.int8, "wire": args.wire,
                "buckets": buckets,
                "mode": (f"open-loop @{args.rate}/s" if args.rate
                         else f"closed-loop x{args.clients}"),
                "zero_wire": args.zero_wire,
            },
        }
        if raw_ms_per_batch is not None and st.batches:
            # engine-added cost per dispatched batch: measured engine
            # ms/batch minus the same-session raw pipelined control
            # wall time per dispatched batch (robust to partial fills):
            # elapsed = requests/thr, divided over the batches dispatched
            eng_ms = ((st.requests / thr) / st.batches * 1e3
                      if thr else 0.0)
            out["raw_ms_per_batch"] = round(raw_ms_per_batch, 2)
            out["engine_ms_per_batch"] = round(eng_ms, 2)
            out["engine_overhead_ms_per_batch"] = round(
                eng_ms - raw_ms_per_batch, 2)
        print(json.dumps(out))
    finally:
        engine.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
