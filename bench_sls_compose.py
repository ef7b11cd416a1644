"""Composition attribution for the SLS forward (follow-up to
bench_sls_head.py, which showed the head alone is 2.6 ms while the
sls_full - enc_hiddens delta is 21.7 ms).

bench_sls_profile's enc_hiddens case consumed each hidden with jnp.sum,
which XLA fuses into the producer layer and frees — so it never priced
keeping 24 live [B,T,C] buffers until a post-hoc stack.  These cases do:

  enc_plain      — flagship path (no hidden exposure)
  enc_stack      — encoder -> jnp.stack(hiddens) -> sum (stack is real)
  enc_livesum    — encoder -> sum over hiddens added AFTER the loop ends
                   (all 24 alive, but no stack op)
  sls_full       — the shipping SLSDetector
  sls_streaming  — encoder + per-layer gate/axpy accumulation (candidate)
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
    wav = jnp.asarray(rng.normal(0, 0.1, (args.batch, 64600)).astype(np.float32))

    variables = jax.jit(lambda k: det.init(k, wav[:1], train=False))(
        jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    enc_params = params["encoder"]
    w0 = params["sls_head"]["fc0"]["kernel"]
    b0 = params["sls_head"]["fc0"]["bias"]
    jax.block_until_ready(params)

    def enc_plain(p, w):
        return jnp.sum(enc.apply({"params": p}, w, train=False))

    def enc_stack(p, w):
        _, hiddens = enc.apply({"params": p}, w, train=False,
                               return_hidden_states=True)
        return jnp.sum(jnp.stack(hiddens, axis=0))

    def enc_livesum(p, w):
        _, hiddens = enc.apply({"params": p}, w, train=False,
                               return_hidden_states=True)
        acc = jnp.zeros((), jnp.float32)
        for h in hiddens:
            acc = acc + jnp.sum(h, dtype=jnp.float32)
        return acc

    def sls_full(p, bs, w):
        return jnp.sum(det.apply(
            {"params": p, "batch_stats": bs}, w, train=False)["score"])

    def sls_streaming(p, w):
        """Streaming axpy accumulation front.  CAVEAT: consuming the
        accumulator with a plain jnp.sum lets XLA reassociate the sum
        through the axpy chain and never materialize the [B,T,C]
        accumulator, so this case is a LOWER BOUND on the axpy design,
        not its cost — the real axpy head measured 59.1 ms in-model
        (BENCH_NOTES_r4 sls_head_root_cause).  Kept as the bound."""
        _, hiddens = enc.apply({"params": p["encoder"]}, w, train=False,
                               return_hidden_states=True)
        acc = None
        for h in hiddens:
            pooled = jnp.mean(h, axis=1, dtype=jnp.float32)  # [B, C]
            g = jax.nn.sigmoid(pooled @ w0 + b0)             # [B, 1]
            term = h.astype(jnp.float32) * g[:, None, :]
            acc = term if acc is None else acc + term
        return jnp.sum(acc)

    def sls_fused_to_logits(p, bs, w):
        """Streaming front + the BN/SELU/pool/MLP tail via the real head
        module but WITHOUT the final-LN 'features' output — isolates
        whatever sls_full pays beyond the fused sum."""
        from sls_tpu.heads.sls import SLSHead

        _, hiddens = enc.apply({"params": p["encoder"]}, w, train=False,
                               return_hidden_states=True)
        head = SLSHead()
        lp = head.apply(
            {"params": p["sls_head"],
             "batch_stats": bs.get("sls_head", {})},
            hiddens, train=False)
        return jnp.sum(lp)

    cases = {
        "enc_plain": (jax.jit(enc_plain), (enc_params, wav)),
        "enc_stack": (jax.jit(enc_stack), (enc_params, wav)),
        "enc_livesum": (jax.jit(enc_livesum), (enc_params, wav)),
        "sls_full": (jax.jit(sls_full), (params, batch_stats, wav)),
        "sls_streaming": (jax.jit(sls_streaming), (params, wav)),
        "sls_fused_to_logits": (jax.jit(sls_fused_to_logits),
                                (params, batch_stats, wav)),
    }
    out = {}
    for name, (fn, fargs) in cases.items():
        out[name + "_ms"] = round(_time(fn, fargs, args.iters), 2)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)
    print(json.dumps({"batch": args.batch, "compose_ms": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
