"""TopK Sparse Autoencoder (https://arxiv.org/abs/2406.04093) in Flax.

One module covers the reference's whole SAE family via
``SAEConfig.variant`` (reference classes: model.py:42-104,
model_window_topk.py:40-231, model_cpc.py:40-192):

- tied initialization: decoder atoms drawn uniform and normalized to unit
  L2, encoder initialized to the decoder transpose, zero biases
  (reference: model.py:56-66)
- encode: ReLU(enc(x - b_dec)) followed by the variant's TopK rule
- decode: codes @ W_dec + b_dec

Parameters live in fp32; the enc/dec matmuls run in ``dtype``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sls_tpu.config import SAEConfig
from sls_tpu.sae.sparsify import (
    topk_per_row,
    window_topk_hard,
    window_topk_overlap,
)


class TopKSAE(nn.Module):
    config: SAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        D, M = cfg.activation_dim, cfg.dict_size

        def init_w_dec(key, shape, dtype=jnp.float32):
            # Uniform box (torch Linear default direction distribution),
            # then unit-norm per dictionary atom — scale cancels.
            w = jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
            return w / jnp.linalg.norm(w, axis=1, keepdims=True)

        # [dict_size, activation_dim]; row = unit-norm dictionary atom
        self.W_dec = self.param("W_dec", init_w_dec, (M, D))
        # Tied init: encoder starts as decoder transpose
        self.W_enc = self.param(
            "W_enc", lambda key, shape: jnp.transpose(self.W_dec), (D, M)
        )
        self.b_enc = self.param("b_enc", nn.initializers.zeros, (M,))
        self.b_dec = self.param("b_dec", nn.initializers.zeros, (D,))

    def pre_activations(self, x: jnp.ndarray) -> jnp.ndarray:
        """ReLU encoder activations before sparsification.  x: [..., D]."""
        if self.config.use_pallas:
            from sls_tpu.kernels.sae_kernels import sae_encode_relu

            flat = x.reshape(-1, x.shape[-1])
            out = sae_encode_relu(flat, self.W_enc, self.b_enc, self.b_dec)
            return out.reshape(*x.shape[:-1], self.config.dict_size)
        h = (x - self.b_dec).astype(self.dtype) @ self.W_enc.astype(self.dtype)
        return jax.nn.relu(h.astype(jnp.float32) + self.b_enc)

    def sparsify(self, acts: jnp.ndarray) -> jnp.ndarray:
        """Apply the configured TopK rule.  Window variants need [B,T,M]."""
        cfg = self.config
        if cfg.variant == "per_timestep":
            return topk_per_row(acts, cfg.k)
        if acts.ndim != 3:
            raise ValueError(
                f"variant {cfg.variant!r} needs [B,T,M] activations, "
                f"got shape {acts.shape}"
            )
        if cfg.variant == "window_overlap":
            return window_topk_overlap(acts, cfg.k, cfg.window_size)
        if cfg.variant == "window_hard":
            return window_topk_hard(acts, cfg.k, cfg.window_size)
        raise ValueError(f"unknown SAE variant: {cfg.variant!r}")

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sparse codes for x ([B,T,D] or [N,D]; window variants require
        the 3-D form, matching the reference's temporal_dim contract)."""
        cfg = self.config
        if cfg.use_pallas and cfg.variant == "per_timestep":
            # single fused kernel: matmul + ReLU + exact topk threshold
            # (differentiable via custom VJP)
            from sls_tpu.kernels.sae_kernels import sae_encode_topk

            flat = x.reshape(-1, x.shape[-1])
            out = sae_encode_topk(flat, self.W_enc, self.b_enc, self.b_dec,
                                  cfg.k)
            return out.reshape(*x.shape[:-1], cfg.dict_size)
        if (cfg.use_pallas and cfg.variant == "window_overlap"
                and x.ndim == 3 and cfg.window_size % 2 == 0):
            # fused encode + VMEM-resident vote merge
            from sls_tpu.kernels.sae_kernels import window_topk_overlap_pallas

            acts = self.pre_activations(x)
            return window_topk_overlap_pallas(acts, cfg.k, cfg.window_size)
        return self.sparsify(self.pre_activations(x))

    def encode_threshold(self, x: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
        """JumpReLU-style inference: keep activations above a per-feature
        threshold instead of TopK (reference: model_backup.py:75-108
        'use_threshold' encode path with the ``threshold`` buffer).

        Unlike TopK, the number of active features varies per frame; use
        ``calibrate_threshold`` to derive thresholds that reproduce a
        trained model's TopK sparsity level on average."""
        acts = self.pre_activations(x)
        return acts * (acts > threshold).astype(acts.dtype)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        if self.config.use_pallas:
            from sls_tpu.kernels.sae_kernels import sae_decode

            flat = codes.reshape(-1, codes.shape[-1])
            out = sae_decode(flat, self.W_dec, self.b_dec)
            return out.reshape(*codes.shape[:-1], self.config.activation_dim)
        y = codes.astype(self.dtype) @ self.W_dec.astype(self.dtype)
        return y.astype(jnp.float32) + self.b_dec

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (reconstruction, sparse_codes)."""
        codes = self.encode(x)
        return self.decode(codes), codes


def reconstruction_loss(recon: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean-squared reconstruction error (reference: model.py:225)."""
    return jnp.mean(jnp.square(recon.astype(jnp.float32) - target.astype(jnp.float32)))


def calibrate_threshold(
    acts: jnp.ndarray, k: int, per_feature: bool = False
) -> jnp.ndarray:
    """Derive a JumpReLU threshold reproducing TopK-k sparsity on average.

    ``acts``: post-ReLU encoder activations ([..., M], flattened over
    leading dims; get them from ``TopKSAE.pre_activations`` on a held-out
    calibration batch).  Returns a scalar (default — the reference's
    ``threshold`` buffer is a scalar, model_backup.py:62,84) or an [M]
    per-feature vector; both are chosen so that the expected number of
    activations above threshold per frame equals ``k``.

    scalar:       t = (1 - k/M)-quantile of ALL activations
    per-feature:  t_m = (1 - k/M)-quantile of feature m's activations
                  (expected total actives = sum_m k/M = k)
    """
    acts = jnp.asarray(acts, jnp.float32)
    m = acts.shape[-1]
    flat = acts.reshape(-1, m)
    q = 1.0 - k / m
    if per_feature:
        return jnp.quantile(flat, q, axis=0)
    return jnp.quantile(flat.reshape(-1), q)


def threshold_from_state(state, prefix: str = "sae.") -> Optional[float]:
    """Extract the trained scalar ``threshold`` buffer from a reference
    checkpoint state dict (model_backup.py:62: registered buffer,
    -1.0 when never calibrated -> returns None)."""
    import numpy as np

    key = f"{prefix}threshold"
    cleaned = {k.removeprefix("module."): v for k, v in state.items()}
    if key not in cleaned:
        return None
    value = float(np.asarray(cleaned[key]))
    return value if value >= 0.0 else None
