"""SAE sparsity evaluation.

Library form of the reference's sparsity scripts
(reference: evaluate_sparsity.py:20, evaluate_window_topk_sparsity.py:24,
simple_sparsity_check.py): active-fraction stats, dead features,
per-feature activation frequencies, and weight-only diagnostics.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def sparsity_stats(codes) -> Dict[str, float]:
    """Activation sparsity over [B, T, D] sparse codes."""
    a = np.asarray(codes) > 0
    B, T, D = a.shape
    active_per_frame = a.sum(-1)  # [B, T]
    feature_freq = a.reshape(-1, D).mean(0)  # [D]
    return {
        "mean_active_per_frame": float(active_per_frame.mean()),
        "sparsity_fraction": float(a.mean()),
        "dead_feature_count": int((feature_freq == 0).sum()),
        "dead_feature_fraction": float((feature_freq == 0).mean()),
        "max_feature_freq": float(feature_freq.max()),
        "active_frame_fraction": float((active_per_frame > 0).mean()),
    }


def feature_activation_freq(codes) -> np.ndarray:
    """Per-feature activation frequency over all frames: [D]."""
    a = np.asarray(codes) > 0
    return a.reshape(-1, a.shape[-1]).mean(0)


def weight_diagnostics(w_dec: np.ndarray) -> Dict[str, float]:
    """Weight-only SAE health check (reference: simple_sparsity_check.py):
    decoder atom norms and pairwise coherence."""
    w = np.asarray(w_dec)  # [dict_size, activation_dim]
    norms = np.linalg.norm(w, axis=1)
    unit = w / np.maximum(norms[:, None], 1e-12)
    # max off-diagonal coherence on a subsample (full 4096^2 is fine too,
    # but keep it bounded for big dicts)
    m = min(len(w), 1024)
    sub = unit[:m]
    gram = np.abs(sub @ sub.T)
    np.fill_diagonal(gram, 0.0)
    return {
        "mean_atom_norm": float(norms.mean()),
        "min_atom_norm": float(norms.min()),
        "max_atom_norm": float(norms.max()),
        "max_coherence": float(gram.max()),
        "mean_coherence": float(gram.mean()),
    }


def dead_neuron_ratio(codes) -> float:
    """Fraction of dictionary atoms never active in the given batch
    (reference: model_backup.py get_dead_neuron_ratio)."""
    return float((feature_activation_freq(codes) == 0).mean())
