"""SLS (Sensitive Layer Selection) classification head.

The upstream XLS-R+SLS architecture behind the reference's headline
numbers (EER 1.92% 2021-DF / 2.87% 2021-LA, README.md:84-86).  The
reference repo keeps only a remnant (``getAttenF`` + the double-forward
``layer_results`` fetch, model_backup.py:183-201); this is a complete
TPU-native implementation of the full upstream chain:

    getAttenF: per-layer time-pool -> fc0 -> sigmoid gates;
    gate-weighted sum over layers -> [B, T, C] -> unsqueeze channel ->
    BatchNorm2d(1) -> SELU -> max_pool2d(3,3) -> flatten ->
    fc1 -> SELU -> fc3 -> SELU -> log_softmax

Differences from the remnant's execution (not semantics):
- the encoder is run ONCE with ``return_hidden_states=True`` (the remnant
  called the 300M encoder twice per step to get layer_results)
- the per-layer Python loop over 24 tensors becomes one einsum
- submodule names (fc0 / first_bn / fc1 / fc3) match the upstream torch
  checkpoint so migration is mechanical (see encoder/convert.py
  sls_detector_state_to_flax)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class SLSHead(nn.Module):
    hidden_dim: int = 1024
    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, train: bool = False):
        """hidden_states: [L, B, T, C] stacked per-layer encoder outputs
        (fairseq layer_results: per-layer, pre-final-LN)
        -> log-probabilities [B, num_classes]."""
        h = hidden_states
        L, B, T, C = h.shape

        # getAttenF gates: adaptive_avg_pool1d over time -> fc0 -> sigmoid
        # (mean accumulates fp32; the [L,B,C] pooled tensor is tiny)
        pooled = jnp.mean(h, axis=2, dtype=jnp.float32)  # [L, B, C]
        gate = jax.nn.sigmoid(
            nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="fc0")(pooled)
        )
        # sensitive-layer-weighted fusion: [B, T, C].  The stack stays
        # in the encoder dtype (an fp32 .astype here materialized a
        # 745 MB copy at b36) — the contraction accumulates fp32.
        fused = jnp.einsum(
            "lbtc,lb->btc", h, gate[..., 0].astype(h.dtype),
            preferred_element_type=jnp.float32,
        )

        x = fused[..., None]  # [B, T, C, 1] — NHWC; torch is [B, 1, T, C]
        # BatchNorm2d(1): one mean/var over all (B, T, C) elements of the
        # single channel; torch momentum 0.1 == flax momentum 0.9
        x = nn.BatchNorm(
            use_running_average=not train, axis=-1, momentum=0.9,
            dtype=jnp.float32, param_dtype=jnp.float32, name="first_bn",
        )(x)
        x = jax.nn.selu(x)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(3, 3))
        # flatten: [B, T', C', 1] C-order == torch [B, 1, T', C'] flatten
        x = x.reshape(B, -1)

        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = jax.nn.selu(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc3")(x)
        # upstream applies SELU to the 2-class logits before log_softmax
        x = jax.nn.selu(x)
        return jax.nn.log_softmax(x, axis=-1)
