"""Classification heads.

``MeanPoolClassifier`` is the live head of every reference model
(reference: model.py:182-189): time-mean pooling, then
LayerNorm -> Linear(d, 256) -> ReLU -> Dropout(0.3) -> Linear(256, 2),
log-softmax outputs.  Class 1 = bonafide.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class MeanPoolClassifier(nn.Module):
    hidden_dim: int = 256
    num_classes: int = 2
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, features: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """features: [B, T, D] -> log-probabilities [B, num_classes]."""
        pooled = features.astype(jnp.float32).mean(axis=1)  # AdaptiveAvgPool1d(1)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="norm")(pooled)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(h)
        h = jax.nn.relu(h.astype(jnp.float32))
        h = nn.Dropout(rate=self.dropout)(h, deterministic=not train)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc2")(h)
        return jax.nn.log_softmax(logits, axis=-1)
