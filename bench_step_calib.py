"""Calibration probes for the train-step speed-of-light argument.

Three measurements feeding docs/BENCH_NOTES_r3.json:

  null_dispatch : pipelined rate of a trivial jitted program — the
                  relay's per-dispatch floor, needed to de-bias the
                  standalone optimizer/guard numbers in
                  bench_train_profile.py (a 0-FLOP program still costs
                  the relay round trip even pipelined).
  fwd_curve     : eval-mode forward ms/utt across batch sizes around
                  the b36 sweet spot (bench.py's 860 utts/s = 66% MFU)
                  vs the b64/b112 plateau (~49%), isolating how much of
                  the train gap is the forward layout effect.
  step_noguard  : the production train step with the non-finite guard
                  select removed — quantifies the guard's true
                  in-context cost (the profile showed XLA fuses it).

Pipelined timing with scalar host fetch throughout (relay-safe).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _force(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jax.device_get(jnp.sum(leaf)))


def timed(fn, args, iters):
    _force(fn(*args))
    start = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.time() - start) / iters


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--fwd_batches", type=int, nargs="+",
                        default=[32, 36, 40, 48])
    parser.add_argument("--step_batch", type=int, default=64)
    parser.add_argument("--skip_noguard", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    report = {}

    # 1. relay dispatch floor
    @jax.jit
    def null_prog(x):
        return x + 1.0

    x = jnp.zeros(())
    ms = 1e3 * timed(null_prog, (x,), 32)
    report["null_dispatch_ms"] = round(ms, 3)
    print(f"# null_dispatch: {ms:.2f} ms", file=sys.stderr)

    # 2. forward curve over batch
    from sls_tpu.config import (
        ExperimentConfig, ModelConfig, SAEConfig, TrainConfig, XLSRConfig,
    )
    from sls_tpu.models.detector import Detector

    mcfg = ModelConfig(
        encoder=XLSRConfig(dtype=jnp.bfloat16),
        use_sae=True,
        use_sparse_features=True,
        sae=SAEConfig(activation_dim=1024, dict_size=4096, k=128),
    )
    model = Detector(mcfg)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    wav_full = jnp.asarray(
        rng.normal(0, 0.1, (max(args.fwd_batches), 64600)).astype(np.float32)
    )
    init_fn = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, wav_full[:2],
                             train=False)
    )
    params = init_fn(key)["params"]

    @jax.jit
    def fwd(p, w):
        return model.apply({"params": p}, w, train=False)["score"]

    curve = {}
    for b in args.fwd_batches:
        sec = timed(fwd, (params, wav_full[:b]), args.iters)
        ups = b / sec
        curve[str(b)] = {"utts_per_sec": round(ups, 1),
                         "ms_per_utt": round(1e3 * sec / b, 3)}
        print(f"# fwd b{b}: {ups:.1f} utts/s "
              f"({1e3 * sec / b:.2f} ms/utt)", file=sys.stderr)
    report["fwd_curve"] = curve

    # 3. production step without the guard
    if not args.skip_noguard:
        from sls_tpu.train.loss import weighted_nll
        from sls_tpu.models.detector import total_loss
        from sls_tpu.train.steps import (
            TrainState, make_optimizer, trainable_decay_mask,
        )

        cfg = ExperimentConfig(
            model=mcfg, train=TrainConfig(batch_size=args.step_batch,
                                          lr=1e-6),
        )
        B = cfg.train.batch_size
        wav = wav_full[:B] if B <= wav_full.shape[0] else jnp.asarray(
            rng.normal(0, 0.1, (B, 64600)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, B))
        valid = jnp.ones((B,), bool)
        tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                            trainable_decay_mask(cfg))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=tx)
        del params
        tcfg = cfg.train

        def step_noguard(s, w, y, v, base_rng):
            dropout_rng = jax.random.fold_in(base_rng, s.step)

            def loss_fn(p):
                out = model.apply({"params": p}, w, train=True,
                                  rngs={"dropout": dropout_rng})
                cls = weighted_nll(out["log_probs"], y, tcfg.loss_weights,
                                   v)
                return total_loss(cls, out["sae_loss"], tcfg.sae_weight)

            loss, grads = jax.value_and_grad(loss_fn)(s.params)
            return s.apply_gradients(grads=grads), loss

        step = jax.jit(step_noguard, donate_argnums=(0,))
        state, loss = step(state, wav, labels, valid, key)
        _force(loss)
        start = time.time()
        for _ in range(args.iters):
            state, loss = step(state, wav, labels, valid, key)
        _force(loss)
        sec = (time.time() - start) / args.iters
        report["step_noguard"] = {
            "batch": B,
            "utts_per_sec": round(B / sec, 1),
            "ms_per_utt": round(1e3 * sec / B, 3),
        }
        print(f"# step_noguard b{B}: {B / sec:.1f} utts/s", file=sys.stderr)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
