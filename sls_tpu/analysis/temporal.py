"""Temporal-stability analysis of sparse SAE codes — vectorized.

Library equivalents of the reference's per-model analysis methods
(reference: model_window_topk.py:435-1255 — analyze_temporal_stability,
_compute_feature_lifetimes, analyze_temporal_failure_modes,
analyze_window_boundary_discontinuity, analyze_semantic_drift,
analyze_multi_scale_temporal_structure) and the comparison scripts
(analyze_temporal_stability.py, compare_temporal_models.py).

The reference loops over timesteps/features in Python; every metric here
is a closed-form array computation over [B, T, D] activation masks, so the
full 2021-LA eval set can be analyzed in minutes instead of hours.

All functions take ``codes`` = sparse activations [B, T, D] (numpy or jax)
and return plain floats / numpy arrays, JSON-ready.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _active(codes) -> np.ndarray:
    return np.asarray(codes) > 0


def jaccard_consecutive(codes) -> np.ndarray:
    """Jaccard similarity of active-feature sets between consecutive
    frames.  Returns [B, T-1]."""
    a = _active(codes)
    inter = (a[:, :-1] & a[:, 1:]).sum(-1)
    union = (a[:, :-1] | a[:, 1:]).sum(-1)
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def mean_temporal_jaccard(codes) -> float:
    """Headline stability number (reference result: 77.2% per-timestep ->
    84.9% window w=8, research_summary_table.md:8)."""
    return float(jaccard_consecutive(codes).mean())


def feature_lifetimes(codes) -> Dict[str, float]:
    """Mean consecutive-active run length ("lifetime", frames).

    Exact closed form: lifetime = total active frames / number of runs
    (runs counted by 0->1 transitions).  Reference reports 8.6 frames
    (per-timestep) vs 67.2 (window w=8)."""
    a = _active(codes)
    prev = np.concatenate([np.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    starts = a & ~prev
    total_active = a.sum(axis=1).astype(np.float64)  # [B, D]
    n_runs = starts.sum(axis=1).astype(np.float64)  # [B, D]
    with np.errstate(invalid="ignore"):
        per_feature = np.where(n_runs > 0, total_active / np.maximum(n_runs, 1),
                               0.0)
    active_features = n_runs > 0
    mean_lifetime = (
        float(per_feature[active_features].mean()) if active_features.any() else 0.0
    )
    return {
        "mean_lifetime": mean_lifetime,
        "mean_runs_per_feature": float(n_runs.mean()),
        "max_lifetime": float(per_feature.max()) if per_feature.size else 0.0,
    }


def flip_counts(codes) -> np.ndarray:
    """Activation state changes per (utterance, feature): [B, D]."""
    a = _active(codes)
    return (a[:, 1:] != a[:, :-1]).sum(axis=1)


def boundary_discontinuity(
    codes, window: int, overlap: bool = False
) -> Dict[str, float]:
    """Interior vs window-boundary Jaccard and the discontinuity ratio
    (reference result: 0.992 vs 0.823, discontinuity 0.169 at w=8;
    research_summary_table.md:26-28).

    ``overlap=True`` places boundaries at the 50%-overlap stride (w//2)
    instead of w — the overlap-window model's boundary grid
    (reference: eval_overlap_clean.py:60-85)."""
    j = jaccard_consecutive(codes)  # [B, T-1]; j[:, t] spans t -> t+1
    T1 = j.shape[1]
    t = np.arange(T1)
    step = max(1, window // 2) if overlap else window
    is_boundary = (t + 1) % step == 0
    interior = float(j[:, ~is_boundary].mean()) if (~is_boundary).any() else 1.0
    boundary = float(j[:, is_boundary].mean()) if is_boundary.any() else 1.0
    disc = (interior - boundary) / interior if interior > 0 else 0.0
    return {
        "interior_jaccard": interior,
        "boundary_jaccard": boundary,
        "discontinuity": float(disc),
    }


def multi_scale_structure(
    codes, windows: Sequence[int] = (2, 4, 8, 16, 32)
) -> Dict[str, Dict[str, float]]:
    """Boundary discontinuity at multiple window scales; the scale with
    the least discontinuity is the 'natural' temporal granularity
    (reference: analyze_multi_scale_temporal_structure,
    model_window_topk.py:1169-1255)."""
    per_window = {str(w): boundary_discontinuity(codes, w) for w in windows}
    best = min(per_window, key=lambda w: per_window[w]["discontinuity"])
    # homogeneous per-window dict + the winner as a sibling, so consumers
    # can iterate per_window.items() without special-casing one key
    return {"per_window": per_window, "optimal_window": float(best)}


def transient_persistent_split(
    codes, lifetime_threshold: float
) -> Dict[str, np.ndarray]:
    """Per-feature mean lifetime and the transient/persistent partition
    (reference: visualize_transient_features.py:29,
    analyze_feature_temporal_types.py)."""
    a = _active(codes)
    prev = np.concatenate([np.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    starts = (a & ~prev).sum(axis=1).astype(np.float64)  # [B, D]
    total = a.sum(axis=1).astype(np.float64)
    # aggregate over batch: mean lifetime per feature
    feat_total = total.sum(axis=0)
    feat_runs = starts.sum(axis=0)
    lifetime = np.where(feat_runs > 0, feat_total / np.maximum(feat_runs, 1), 0.0)
    ever_active = feat_runs > 0
    return {
        "lifetime": lifetime,  # [D]
        "ever_active": ever_active,  # [D]
        "transient": ever_active & (lifetime < lifetime_threshold),
        "persistent": ever_active & (lifetime >= lifetime_threshold),
    }


def feature_identity_stability(codes, window: int) -> Dict[str, float]:
    """How much of each window's active-feature identity carries into the
    next window (reference: analyze_feature_identity_stability,
    model_window_topk.py:576-659).

    Per utterance, the active set of each non-overlapping window is
    compared to the next window's set; returns the mean carry-over
    fraction and the per-feature persistence rate distribution summary.
    """
    a = _active(codes)
    B, T, D = a.shape
    n_win = T // window
    if n_win < 2:
        return {"identity_carryover": 1.0, "n_windows": float(n_win)}
    aw = a[:, : n_win * window].reshape(B, n_win, window, D).any(axis=2)
    prev, nxt = aw[:, :-1], aw[:, 1:]
    inter = (prev & nxt).sum(-1)
    size_prev = prev.sum(-1)
    carry = np.where(size_prev > 0, inter / np.maximum(size_prev, 1), 1.0)
    # per-feature persistence: P(active in w+1 | active in w)
    feat_prev = prev.sum(axis=(0, 1))
    feat_both = (prev & nxt).sum(axis=(0, 1))
    with np.errstate(invalid="ignore"):
        persistence = np.where(feat_prev > 0,
                               feat_both / np.maximum(feat_prev, 1), 0.0)
    active_feats = feat_prev > 0
    return {
        "identity_carryover": float(carry.mean()),
        "mean_feature_persistence": float(
            persistence[active_feats].mean()) if active_feats.any() else 0.0,
        "n_windows": float(n_win),
    }


def semantic_drift(
    codes, window: int, top_k_features: int = 100
) -> Dict[str, float]:
    """Context-consistency of feature identities across windows
    (reference: analyze_semantic_drift, model_window_topk.py:843-937).

    Reference semantics, vectorized: every window contributes a binary
    active-feature set; each occurrence of a feature records its CONTEXT
    (the window's active set with the feature itself removed).  A
    feature's consistency is the mean pairwise cosine similarity of its
    context vectors over all occurrences (off-diagonal only); the
    reported score averages the ``top_k_features`` most frequent
    features (reference reports ~0.904 for CPC w=8).

    The O(n^2) pairwise-cosine mean is computed in O(n*D) via
    sum_{i!=j} c_i.c_j = ||sum c||^2 - sum ||c||^2 on unit rows
    (zero-context rows normalize to zero exactly like F.normalize).
    """
    a = _active(codes)  # bool [B, T, D]
    B, T, D = a.shape
    n_win = T // window
    if n_win < 1:
        return {"semantic_consistency": 1.0, "n_windows": 0.0,
                "num_features_analyzed": 0.0}
    win_active = (
        a[:, : n_win * window]
        .reshape(B, n_win, window, D)
        .any(axis=2)
        .reshape(B * n_win, D)
        .astype(np.float32)
    )  # [W, D] — one binary active-set per window occurrence
    freq = win_active.sum(axis=0)
    top = np.argsort(-freq)[:top_k_features]
    scores = []
    for d in top:
        rows = win_active[win_active[:, d] > 0]
        n = rows.shape[0]
        if n < 2:
            continue
        ctx = rows.copy()
        ctx[:, d] = 0.0
        norms = np.linalg.norm(ctx, axis=1, keepdims=True)
        unit = np.divide(ctx, norms, out=np.zeros_like(ctx),
                         where=norms > 0)
        s = unit.sum(axis=0)
        n_unit = float((norms[:, 0] > 0).sum())  # sum of unit norms^2
        scores.append(float((s @ s - n_unit) / (n * (n - 1))))
    if not scores:
        # No feature occurs in >=2 windows: as uninformative as n_win<1
        # above — report the same neutral value, not the 0.0 extreme.
        return {"semantic_consistency": 1.0, "n_windows": float(n_win),
                "num_features_analyzed": 0.0}
    return {
        "semantic_consistency": float(sum(scores) / len(scores)),
        "n_windows": float(n_win),
        "num_features_analyzed": float(len(scores)),
    }


def temporal_summary(codes, window: int = 8) -> Dict[str, float]:
    """One-call summary used by the analysis CLIs / reports."""
    life = feature_lifetimes(codes)
    disc = boundary_discontinuity(codes, window)
    return {
        "mean_jaccard": mean_temporal_jaccard(codes),
        "mean_lifetime": life["mean_lifetime"],
        "mean_flips": float(flip_counts(codes).mean()),
        **disc,
        **semantic_drift(codes, window),
    }
