"""The full anti-spoofing detector: XLS-R encoder + TopK SAE + classifier.

Functional re-design of the reference ``Model`` classes
(reference: model.py:144-299, model_window_topk.py:271-433,
model_cpc.py:232-554).  One module covers all variants via ModelConfig:

    wav [B, 64600]
      -> XLS-R encoder          [B, T, 1024]
      -> TopK SAE encode        [B, T, dict_size]   (variant-specific rule)
      -> decode                 [B, T, 1024]        (MSE recon loss)
      -> classify sparse codes (use_sparse_features) or reconstruction
      -> mean-pool + MLP head   [B, 2] log-probs    (class 1 = bonafide)

Instead of the reference's polymorphic returns keyed by three booleans
(model_cpc.py:319-410), forward always returns a dict; callers take what
they need and jit drops the rest as dead code — interpretability tensors
are free unless actually fetched.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sls_tpu.config import ModelConfig
from sls_tpu.encoder.xlsr import XLSREncoder
from sls_tpu.heads.classifier import MeanPoolClassifier
from sls_tpu.sae.cpc import CPCHead
from sls_tpu.sae.sparsify import aggregate_windows_mean
from sls_tpu.sae.topk import TopKSAE, reconstruction_loss


class Detector(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.encoder = XLSREncoder(cfg.encoder, name="encoder")
        if cfg.use_sae:
            sae_dtype = jnp.bfloat16 if cfg.sae.bf16 else jnp.float32
            self.sae = TopKSAE(cfg.sae, dtype=sae_dtype, name="sae")
        if cfg.use_cpc and cfg.use_sae:
            self.cpc = CPCHead(cfg.cpc, name="cpc")
        self.classifier = MeanPoolClassifier(
            hidden_dim=cfg.classifier_hidden,
            num_classes=cfg.num_classes,
            dropout=cfg.classifier_dropout,
            name="classifier",
        )

    def __call__(
        self,
        wav: jnp.ndarray,
        train: bool = False,
        compute_cpc: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Returns a dict with:

        log_probs  [B, 2]      log-softmax outputs (class 1 = bonafide)
        score      [B]         P(bonafide) = exp(log_probs[:, 1]) — the
                               score-file contract (reference:
                               eval_2021_LA_window.py:34-37)
        sae_loss   []          MSE reconstruction loss (0 when no SAE)
        cpc_loss   []          InfoNCE loss (0 unless compute_cpc)
        features   [B, T, 1024] encoder output
        codes      [B, T, M]   sparse SAE codes (when use_sae)
        """
        cfg = self.config
        feats = self.encoder(wav, train=train)  # [B, T, 1024]
        if cfg.freeze_encoder:
            feats = jax.lax.stop_gradient(feats)
        feats32 = feats.astype(jnp.float32)

        out: Dict[str, jnp.ndarray] = {"features": feats32}
        sae_loss = jnp.zeros((), jnp.float32)
        cpc_loss = jnp.zeros((), jnp.float32)

        if cfg.use_sae:
            codes = self.sae.encode(feats32)  # [B, T, M]
            recon = self.sae.decode(codes)  # [B, T, 1024]
            sae_loss = reconstruction_loss(recon, feats32)
            out["codes"] = codes
            out["recon"] = recon
            cls_in = codes if cfg.use_sparse_features else recon

            if cfg.use_cpc and compute_cpc:
                windows = aggregate_windows_mean(codes, cfg.sae.window_size)
                cpc_loss = self.cpc(windows)
                out["window_features"] = windows
        else:
            cls_in = feats32

        log_probs = self.classifier(cls_in, train=train)
        out["log_probs"] = log_probs
        out["score"] = jnp.exp(log_probs[:, 1])
        out["sae_loss"] = sae_loss
        out["cpc_loss"] = cpc_loss
        return out

    def encode_sae(self, wav: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Encoder features + SAE codes only (analysis entry point,
        replacing the reference's hand-restitched forward in
        analyze_decision_relevance.py:59-94)."""
        feats = self.encoder(wav, train=False).astype(jnp.float32)
        codes = self.sae.encode(feats)
        return {"features": feats, "codes": codes}

    def classify_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Classifier on externally supplied codes — the functional hook
        gradient-attribution needs (d logit / d codes)."""
        return self.classifier(codes, train=False)


def total_loss(
    cls_loss: jnp.ndarray,
    sae_loss: Optional[jnp.ndarray],
    sae_weight: float,
    cpc_loss: Optional[jnp.ndarray] = None,
    cpc_weight: float = 0.0,
) -> jnp.ndarray:
    """L = L_cls + w_sae * L_recon [+ w_cpc * L_cpc]
    (reference: model.py:295-299, model_cpc.py:530-554)."""
    total = cls_loss
    if sae_loss is not None:
        total = total + sae_weight * sae_loss
    if cpc_loss is not None and cpc_weight:
        total = total + cpc_weight * cpc_loss
    return total
