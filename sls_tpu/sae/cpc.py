"""Contrastive-predictive-coding head over window-aggregated SAE codes.

Reference: model_cpc.py:288-302 (projection/predictor MLPs) and
model_cpc.py:473-528 (multi-scale InfoNCE with cross-batch negatives,
diagonal positives, temperature 0.07).

Sharding note: the InfoNCE logits are an [M, M] matrix with
M = B_global * (N - delta).  Under data-parallel sharding the
``q @ k.T`` contraction makes XLA all-gather the (tiny, ~[B,24,256])
key block over ICI automatically — the negatives therefore span the
*global* batch, exactly like the reference's single-process semantics.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from sls_tpu.config import CPCConfig


class CPCHead(nn.Module):
    config: CPCConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, window_features: jnp.ndarray) -> jnp.ndarray:
        """window_features: [B, N, M] -> InfoNCE loss scalar."""
        cfg = self.config
        H = cfg.hidden_dim

        def mlp(name):
            return nn.Sequential(
                [
                    nn.Dense(H, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{name}_fc1"),
                    jax.nn.relu,
                    nn.Dense(H, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{name}_fc2"),
                ]
            )

        proj = mlp("proj")
        pred = mlp("pred")

        s = proj(window_features).astype(jnp.float32)
        s = s / (jnp.linalg.norm(s, axis=-1, keepdims=True) + 1e-12)

        B, N, _ = s.shape
        total = jnp.zeros((), jnp.float32)
        n_valid = 0
        for delta in cfg.prediction_steps:
            if N <= delta:
                continue
            q = pred(s[:, :-delta, :]).astype(jnp.float32)
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
            k = s[:, delta:, :]

            q = q.reshape(-1, H)  # [M, H], M = B*(N-delta)
            k = k.reshape(-1, H)
            logits = (q @ k.T) / cfg.temperature  # [M, M]
            labels = jnp.arange(logits.shape[0])
            total = total + optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            n_valid += 1

        if n_valid == 0:
            return jnp.zeros((), jnp.float32)
        return total / n_valid
