"""Legacy tied-weight sparse autoencoder (the reference's first SAE).

Functional re-implementation of the reference's ``SparseAutoencoder``
(reference: model_backup.py:242-326): tied weights (decoder = encoderᵀ),
activation clamping, TopK-over-ReLU sparsity, an L1 sparsity penalty, and
dead-neuron telemetry.  Kept for checkpoint compatibility and ablations;
the TopK SAE family (sae/topk.py) is the live architecture.

Dead-neuron tracking is a pure function over collected codes instead of
mutable buffers (reference kept ``feature_activation_count`` /
``total_samples`` buffers and a ``get_dead_neuron_ratio`` method).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sls_tpu.sae.sparsify import topk_per_row


class TiedSparseAutoencoder(nn.Module):
    """Tied-weight SAE: encode W, decode Wᵀ; L1 + TopK sparsity."""

    input_dim: int = 1024
    hidden_dim: int = 2048
    k: int = 256
    sparsity_coef: float = 1e-3
    clamp_value: float = 10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: [..., input_dim] -> dict(recon, codes, l1_loss, recon_loss)."""
        w = self.param(
            "W",
            nn.initializers.kaiming_uniform(),
            (self.input_dim, self.hidden_dim),
        )
        b_enc = self.param("b_enc", nn.initializers.zeros, (self.hidden_dim,))
        b_dec = self.param("b_dec", nn.initializers.zeros, (self.input_dim,))

        pre = (x - b_dec).astype(self.dtype) @ w.astype(self.dtype)
        pre = jnp.clip(
            pre.astype(jnp.float32) + b_enc, -self.clamp_value, self.clamp_value
        )
        acts = jax.nn.relu(pre)
        codes = topk_per_row(acts, self.k)

        recon = codes.astype(self.dtype) @ w.astype(self.dtype).T
        recon = recon.astype(jnp.float32) + b_dec

        l1 = jnp.abs(codes).mean() * self.sparsity_coef
        recon_loss = jnp.mean(jnp.square(recon - x.astype(jnp.float32)))
        return {
            "recon": recon,
            "codes": codes,
            "l1_loss": l1,
            "recon_loss": recon_loss,
            "loss": recon_loss + l1,
        }


def dead_neuron_stats(codes) -> Dict[str, float]:
    """Dead-neuron telemetry over collected codes [N..., hidden]
    (reference: model_backup.py feature_activation_count /
    get_dead_neuron_ratio).  Delegates the activity definition to
    analysis/sparsity.feature_activation_freq so SAE telemetry and the
    analysis suite can never drift apart."""
    import numpy as np

    from sls_tpu.analysis.sparsity import feature_activation_freq

    freq = feature_activation_freq(codes)
    n_rows = int(np.asarray(codes).size // freq.shape[-1])
    return {
        "dead_ratio": float((freq == 0).mean()),
        "mean_activation_rate": float(freq.mean()),
        "total_samples": n_rows,
    }
