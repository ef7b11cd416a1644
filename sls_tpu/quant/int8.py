"""int8 dynamic-quantized dense layers for the serving path.

MEASURED RESULT (v5e, docs/BENCH_NOTES_r3.json int8_serving): the MXU
runs int8 x int8 -> int32 at ~1.7x the bf16 rate (273.8 TOP/s vs
158.6 TFLOP/s on square 16k matmuls), and SCOPE decides whether that
reaches the end-to-end number.  Dynamic-quant bookkeeping (per-token
abs-max + round over every activation, fp32 rescale of every output)
has a fixed per-matmul cost, so:

- on the wide FFN GEMMs (1024x4096, ~60 GFLOP each) the MXU saving
  dominates: ``int8_scope='ffn'`` serves the flagship at 978 vs 858
  utts/s (1.14x) — the default scope and bench.py's serving config;
- adding the narrow QKVO projections (1024x1024) flips the sign:
  ``int8_scope='all'`` measures 0.94x, kept only for wider-layer
  configs.

Attention score/context einsums and convs stay bf16 either way; max
score deviation 0.0105 on random-init at the real topology, the same
order as the characterized bf16-vs-fp32 round-off.

The recipe, for EVAL ONLY:

- activations: per-row (per-token) symmetric int8, scales computed on
  the fly (one max-abs pass — no calibration data needed, no state)
- weights: per-output-channel symmetric int8, quantized in-jit from the
  fp32 params each call.  Measured on-chip this is within noise of
  pre-quantized weights (XLA hoists/fuses the per-channel pass), and it
  keeps the param tree BYTE-IDENTICAL to the bf16 path: every existing
  checkpoint, converter, and parity tool works unchanged, and the flag
  can be flipped per-eval without any weight surgery.
- the int32 accumulator is exact; the only error is the input rounding
  (x -> 8 bits per token row, w -> 8 bits per channel), rescaled in
  fp32: y = (x_q @ w_q) * s_x[:, None] * s_w[None, :].

Training never routes through this path (straight-through estimators
change optimizer behavior; the reference's training recipe is
bit-followed in bf16/fp32) — the caller resolves ``use_int8`` to False
whenever gradients are live.

The reference has no quantized path (pure fp32 eager torch); this is a
TPU-native serving feature beyond reference scope.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def int8_dot(x: jnp.ndarray, kernel: jnp.ndarray,
             out_dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """Dynamic-quantized matmul: x [..., K] @ kernel [K, N] -> [..., N].

    Per-row activation scales, per-column weight scales, int32
    accumulation on the MXU, fp32 rescale.  ``kernel`` arrives in the
    param dtype (fp32) and is quantized here (see module docstring for
    why in-jit).
    """
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    s_x = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-9) / 127.0
    xq = jnp.round(xf / s_x).astype(jnp.int8)

    wf = kernel.astype(jnp.float32)
    s_w = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12) / 127.0
    wq = jnp.round(wf / s_w).astype(jnp.int8)

    acc = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_x * s_w)
    return y.astype(out_dtype).reshape(*lead, kernel.shape[1])


class QuantizableDense(nn.Module):
    """Drop-in ``nn.Dense`` with a switchable int8 eval path.

    Param tree (names, shapes, dtypes, init) is identical to
    ``nn.Dense(features, dtype=dtype, param_dtype=jnp.float32)`` so
    checkpoints are interchangeable; ``use_int8=False`` reproduces
    nn.Dense's computation exactly (same casts, same dot).
    """

    features: int
    dtype: Any = jnp.bfloat16
    use_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if self.use_int8:
            y = int8_dot(x, kernel, out_dtype=self.dtype)
            return y + bias.astype(self.dtype)
        # exact nn.Dense semantics: promote everything to `dtype`
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        return y + bias.astype(self.dtype)
