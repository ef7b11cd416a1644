"""Component breakdown of the training step (VERDICT r2 #4).

Times jitted sub-programs that partition the full train step, so the
gap between train throughput (215.9 utts/s r2) and the eval-MFU-derived
ceiling can be attributed:

  eval_fwd        : encoder+SAE+head forward, eval mode (bench.py path)
  train_fwd       : same forward in train mode (dropout on) — the delta
                    is the dropout-mask + train-mode cost
  enc_grad        : d(mean(features))/d(params) — encoder fwd+bwd only
  full_grad       : d(total_loss)/d(params) — adds SAE+head fwd+bwd
  optimizer       : apply_gradients alone (Adam + weight decay, donated)
  guard           : the non-finite tree_map select over state
  full_step       : the production train step (all of the above fused)

All timings pipelined (N async dispatches, fetch last) like bench.py.
Prints one JSON object with utts/s and ms/utt per component.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def _force(out):
    """Force completion through a HOST FETCH: on relayed backends
    block_until_ready returns before the device work is done (see
    bench.py methodology); fetching a scalar reduction of one output
    leaf bounds all prior in-order device work."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jax.device_get(jnp.sum(leaf)))


def timed(fn, args, iters, batch):
    """Pipelined timing: dispatch N, fetch only the last."""
    _force(fn(*args))  # compile + warm
    start = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    elapsed = time.time() - start
    return batch * iters / elapsed, 1e3 * elapsed / (batch * iters)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    # b64 (not the b112 train-sweep best): components 3-4 keep params +
    # an UNDONATED grad tree alive alongside the backward activations,
    # which OOMs the 16 GB chip at b112; b64 fits every component and
    # matches the sweep's 212.9 utts/s full-step point for attribution.
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from sls_tpu.config import (
        ExperimentConfig, ModelConfig, SAEConfig, TrainConfig, XLSRConfig,
    )
    from sls_tpu.models.detector import Detector, total_loss
    from sls_tpu.train.loss import weighted_nll
    from sls_tpu.train.steps import create_train_state, make_train_step

    cfg = ExperimentConfig(
        model=ModelConfig(
            encoder=XLSRConfig(dtype=jnp.bfloat16),
            use_sae=True,
            use_sparse_features=True,
            sae=SAEConfig(activation_dim=1024, dict_size=4096, k=128),
        ),
        train=TrainConfig(batch_size=args.batch, lr=1e-6),
    )
    model = Detector(cfg.model)
    B = args.batch
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.1, (B, 64600)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, B))
    valid = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(0)

    # params only for the fwd/grad components; the full TrainState
    # (Adam moments = +2.4 GB fp32) is created AFTER, otherwise the
    # undonated grad outputs + resident moments OOM the 16 GB chip
    init_fn = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, wav[:2],
                             train=False)
    )
    params = init_fn(key)["params"]
    report = {"batch": B}

    def run(name, fn, fargs):
        ups, ms = timed(fn, fargs, args.iters, B)
        report[name] = {"utts_per_sec": round(ups, 1),
                        "ms_per_utt": round(ms, 3)}
        print(f"# {name}: {ups:.1f} utts/s ({ms:.2f} ms/utt)",
              file=sys.stderr)

    # 1. eval-mode forward (the bench.py path at this batch)
    @jax.jit
    def eval_fwd(p, w):
        return model.apply({"params": p}, w, train=False)["score"]

    run("eval_fwd", eval_fwd, (params, wav))

    # 2. train-mode forward (dropout masks on)
    @jax.jit
    def train_fwd(p, w):
        out = model.apply({"params": p}, w, train=True,
                          rngs={"dropout": key})
        return out["score"]

    run("train_fwd", train_fwd, (params, wav))

    # Grad components return a SCALAR reduction of the grad tree, not
    # the 1.26 GB tree itself: the reduction depends on every grad (no
    # DCE) but lets XLA treat grad buffers as reusable temporaries —
    # returning the full tree OOMs b64 alongside the backward
    # activations, and the production step never materializes grads as
    # program outputs either (they feed the fused optimizer update).
    def _gsum(tree):
        return sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(tree))

    # 3. encoder-only fwd+bwd
    @jax.jit
    def enc_grad(p, w):
        def f(p_):
            out = model.apply({"params": p_}, w, train=True,
                              rngs={"dropout": key})
            return out["features"].astype(jnp.float32).mean()
        return _gsum(jax.grad(f)(p))

    run("enc_grad", enc_grad, (params, wav))

    # 4. full fwd+bwd (the loss of the real step)
    @jax.jit
    def full_grad(p, w, y, v):
        def f(p_):
            out = model.apply({"params": p_}, w, train=True,
                              rngs={"dropout": key})
            cls = weighted_nll(out["log_probs"], y,
                               cfg.train.loss_weights, v)
            return total_loss(cls, out["sae_loss"], cfg.train.sae_weight)
        return _gsum(jax.grad(f)(p))

    run("full_grad", full_grad, (params, wav, labels, valid))

    # 5. optimizer alone (donated state, zero-like grads).  The state
    # (Adam moments = +2.4 GB fp32) is created only NOW, from the same
    # param buffers — see the init note above.
    from flax.training.train_state import TrainState

    from sls_tpu.train.steps import make_optimizer, trainable_decay_mask

    tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                        trainable_decay_mask(cfg))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    grads = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), params)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def opt_only(s, g):
        return s.apply_gradients(grads=g)

    # donation consumes the input state each call, so chain
    # output -> input (this is exactly the production pattern); after
    # the warm call `params` aliases dead buffers — not used again
    state = opt_only(state, grads)
    _force(state.step)
    start = time.time()
    for _ in range(args.iters):
        state = opt_only(state, grads)
    _force(state.step)
    elapsed = time.time() - start
    report["optimizer"] = {
        "utts_per_sec": round(B * args.iters / elapsed, 1),
        "ms_per_utt": round(1e3 * elapsed / (B * args.iters), 3),
    }
    print(f"# optimizer: {report['optimizer']['utts_per_sec']} utts/s",
          file=sys.stderr)

    # 6. the finite-guard select over the full state
    @jax.jit
    def guard(s):
        finite = jnp.asarray(True)
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), s, s)

    run("guard_select", guard, (state,))

    # 7. the full production step (donated, chained).  Drop every
    # retained tree first: `grads` (1.26 GB of zeros) and `params`
    # (aliases state.params, which the donated step consumes) would
    # otherwise sit in the arena alongside the step's activations.
    del grads
    del params
    import gc

    gc.collect()
    step = make_train_step(model, cfg, mesh=None)

    out = step(state, wav, labels, valid, key)
    _force(out[1]["loss"])
    st = out[0]
    start = time.time()
    for _ in range(args.iters):
        st, metrics = step(st, wav, labels, valid, key)
    jax.device_get(metrics["loss"])
    elapsed = time.time() - start
    report["full_step"] = {
        "utts_per_sec": round(B * args.iters / elapsed, 1),
        "ms_per_utt": round(1e3 * elapsed / (B * args.iters), 3),
    }
    print(f"# full_step: {report['full_step']['utts_per_sec']} utts/s",
          file=sys.stderr)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
