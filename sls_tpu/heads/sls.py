"""SLS (Sensitive Layer Selection) classification head.

The upstream XLS-R+SLS architecture behind the reference's headline
numbers (EER 1.92% 2021-DF / 2.87% 2021-LA, README.md:84-86).  The
reference repo keeps only a remnant (``getAttenF`` + the double-forward
``layer_results`` fetch, model_backup.py:183-201); this is a complete
TPU-native implementation:

- the encoder is run ONCE with ``return_hidden_states=True`` (the remnant
  called the 300M encoder twice per step to get layer_results)
- per-layer time-pooled features gate each layer via a sigmoid scalar
  (sensitive layer selection), layers are summed in one einsum instead of
  a Python loop over 24 layer tensors
- head: BatchNorm -> SELU -> 3x3 max-pool over the (T, C) grid ->
  flatten -> Linear(1024) -> SELU -> Linear(2) -> log-softmax
"""

from __future__ import annotations

from typing import Any, List

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
        -> log-probabilities [B, num_classes]."""
        h = hidden_states.astype(jnp.float32)
        L, B, T, C = h.shape

        # layer gates from time-pooled features: [L, B, 1]
        pooled = h.mean(axis=2)  # [L, B, C]
        gate = jax.nn.sigmoid(
            nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="layer_gate")(pooled)
        )
        # sensitive-layer-weighted fusion: [B, T, C]
        fused = jnp.einsum("lbtc,lb->btc", h, gate[..., 0])

        x = fused[..., None]  # [B, T, C, 1] — NHWC for norm/pool
        x = nn.BatchNorm(
            use_running_average=not train, axis=-1,
            dtype=jnp.float32, param_dtype=jnp.float32, name="bn",
        )(x)
        x = jax.nn.selu(x)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(3, 3))
        x = x.reshape(B, -1)

        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = jax.nn.selu(x.astype(jnp.float32))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc2")(x)
        return jax.nn.log_softmax(logits, axis=-1)
