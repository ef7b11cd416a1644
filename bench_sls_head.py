"""Per-stage attribution of the SLS head's 21.7 ms (bench_sls_profile, r4).

The head's FLOPs are trivial (<2 GFLOP at b36) yet it costs a third of
the SLS forward, so the time is layout/materialization.  Times each
stage of heads/sls.py as its own jitted program on device-resident
inputs at the real topology ([25, B, 202, 1024] bf16), plus candidate
reformulations:

  stack        — jnp.stack of the 25-layer list (models/sls.py:43)
  pool_gate    — fp32 mean over T of the stack + fc0 + sigmoid
  fused_einsum — einsum('lbtc,lb->btc') gated layer sum (sls.py:55)
  fused_axpy   — same sum as a per-layer scale-add loop (no stack read)
  bn_selu      — BatchNorm2d(1)-equivalent stats + SELU, fp32
  maxpool_rw   — nn.max_pool (reduce_window) (3,3)/(3,3) on [B,T,C,1]
  maxpool_rs   — same pool as crop+reshape+max (windows == strides)
  mlp          — flatten -> fc1 -> SELU -> fc3 -> SELU -> log_softmax
  head_full    — the shipping SLSHead end to end on the stack
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time(fn, args, iters):
    """device_get on the final result is the only reliable sync on the
    axon relay (block_until_ready returns early — bench.py:10)."""
    import jax

    float(jax.device_get(fn(*args)))
    float(jax.device_get(fn(*args)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(out))
    return (time.time() - t0) / iters * 1e3


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=36)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    L, B, T, C = 25, args.batch, 202, 1024
    rng = np.random.default_rng(0)
    hiddens = [
        jax.device_put(jnp.asarray(
            rng.normal(0, 1, (B, T, C)).astype(np.float32), dtype=jnp.bfloat16))
        for _ in range(L)
    ]
    stack = jax.device_put(jnp.stack(hiddens, axis=0))
    w0 = jnp.asarray(rng.normal(0, 0.02, (C, 1)).astype(np.float32))
    b0 = jnp.zeros((1,), jnp.float32)
    gate = jax.device_put(jax.nn.sigmoid(
        jnp.einsum("lbc,co->lbo", stack.astype(jnp.float32).mean(2), w0)
        + b0)[..., 0])
    fused = jax.device_put(jnp.einsum(
        "lbtc,lb->btc", stack, gate.astype(stack.dtype),
        preferred_element_type=jnp.float32))
    flat_dim = (T // 3) * (C // 3)
    w1 = jnp.asarray(rng.normal(0, 0.01, (flat_dim, 1024)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(0, 0.01, (1024, 2)).astype(np.float32))
    pooled_in = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (B, T, C, 1)).astype(np.float32)))
    jax.block_until_ready((stack, gate, fused, pooled_in))

    def stack_fn(hs):
        return jnp.stack(hs, axis=0)

    def pool_gate(s):
        pooled = jnp.mean(s, axis=2, dtype=jnp.float32)
        return jax.nn.sigmoid(jnp.einsum("lbc,co->lbo", pooled, w0) + b0)

    def fused_einsum(s, g):
        return jnp.einsum("lbtc,lb->btc", s, g.astype(s.dtype),
                          preferred_element_type=jnp.float32)

    def fused_axpy(hs, g):
        acc = jnp.zeros((B, T, C), jnp.float32)
        for i, h in enumerate(hs):
            acc = acc + g[i][:, None, None] * h.astype(jnp.float32)
        return acc

    def bn_selu(f):
        x = f[..., None]
        mu = jnp.mean(x)
        var = jnp.mean(jnp.square(x - mu))
        return jax.nn.selu((x - mu) * jax.lax.rsqrt(var + 1e-5))

    def maxpool_rw(x):
        return nn.max_pool(x, window_shape=(3, 3), strides=(3, 3))

    def maxpool_rs(x):
        tp, cp = (T // 3) * 3, (C // 3) * 3
        y = x[:, :tp, :cp, 0].reshape(B, T // 3, 3, C // 3, 3)
        return jnp.max(y, axis=(2, 4))[..., None]

    def mlp(x):
        h = jax.nn.selu(x.reshape(B, -1) @ w1)
        return jax.nn.log_softmax(jax.nn.selu(h @ w3), axis=-1)

    from sls_tpu.heads.sls import SLSHead

    head = SLSHead()
    hvars = jax.jit(lambda s: head.init(jax.random.PRNGKey(0), s))(stack)

    def head_full(v, s):
        return head.apply(v, s, train=False)

    pooled_small = jax.device_put(maxpool_rs(pooled_in))

    def _scal(f):
        """Reduce to one float inside the jitted program so the sync
        fetch costs ~nothing over the relay's thin pipe (38 MB/s)."""
        return jax.jit(lambda *a: jnp.sum(f(*a), dtype=jnp.float32))

    cases = {
        "stack": (_scal(stack_fn), (hiddens,)),
        "pool_gate": (_scal(pool_gate), (stack,)),
        "fused_einsum": (_scal(fused_einsum), (stack, gate)),
        "fused_axpy": (_scal(fused_axpy), (hiddens, gate)),
        "bn_selu": (_scal(bn_selu), (fused,)),
        "maxpool_rw": (_scal(maxpool_rw), (pooled_in,)),
        "maxpool_rs": (_scal(maxpool_rs), (pooled_in,)),
        "mlp": (_scal(mlp), (pooled_small,)),
        "head_full": (_scal(lambda v, s: head_full(v, s)), (hvars, stack)),
    }
    out = {}
    for name, (fn, fargs) in cases.items():
        out[name + "_ms"] = round(_time(fn, fargs, args.iters), 3)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)
    print(json.dumps({"batch": B, "stages_ms": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
