"""Loss functions.

``weighted_nll`` reproduces torch ``nn.NLLLoss(weight=w)`` semantics on
log-softmax inputs with mean reduction: sum(w[y_i] * nll_i) / sum(w[y_i]).
The reference uses weight [0.1, 0.9] — 0.9 on class 1 = bonafide, the
2019-LA train minority class (reference: main.py:524-526; the "WCE" of
its README).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def weighted_nll(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Sequence[float] = (0.1, 0.9),
    valid=None,
) -> jnp.ndarray:
    """Weighted negative log-likelihood on log-probability inputs.

    log_probs: [B, C] log-softmax outputs; labels: [B] int class ids.
    ``valid`` optionally masks padding rows (device-divisibility tiling)
    out of both the numerator and the weight normalizer.
    """
    w = jnp.asarray(class_weights, dtype=jnp.float32)
    picked = jnp.take_along_axis(
        log_probs.astype(jnp.float32), labels[:, None], axis=-1
    )[:, 0]
    sample_w = w[labels]
    if valid is not None:
        sample_w = sample_w * valid.astype(jnp.float32)
    return -(sample_w * picked).sum() / sample_w.sum()


def nll(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Unweighted NLL (reference CPC trainer: train_cpc.py:350)."""
    picked = jnp.take_along_axis(
        log_probs.astype(jnp.float32), labels[:, None], axis=-1
    )[:, 0]
    return -picked.mean()
