"""Temporal failure-mode analyses.

Library equivalents of the reference's hypothesis-testing scripts:

- boundary-error correlation (reference: analyze_boundary_semantics.py,
  analyze_boundary_error_correlation.py): do window-boundary Jaccard
  discontinuities correlate with prediction errors?  Welch t-test +
  Cohen's d between correct/incorrect groups.
- transient spikes + activation variance (reference:
  analyze_temporal_failure_modes, model_window_topk.py:661-766)
- discriminative-transients probe (reference:
  analyze_discriminative_transients, model_window_topk.py:939-1167 and
  improved_transient_analysis.py): logistic probes on transient-only vs
  persistent-only feature activations.
- global cue consistency (reference: analyze_global_cue_consistency.py):
  utterance-global top-k cue overlap, not just adjacent frames.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from sls_tpu.analysis.temporal import (
    boundary_discontinuity,
    jaccard_consecutive,
    transient_persistent_split,
)


def _cohens_d(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = len(a), len(b)
    if na < 2 or nb < 2:
        return 0.0
    pooled = np.sqrt(
        ((na - 1) * a.var(ddof=1) + (nb - 1) * b.var(ddof=1)) / (na + nb - 2)
    )
    return float((a.mean() - b.mean()) / max(pooled, 1e-12))


def boundary_error_correlation(
    codes: np.ndarray,
    correct: np.ndarray,
    window: int,
    overlap: bool = False,
) -> Dict[str, float]:
    """Per-utterance boundary discontinuity vs prediction correctness.

    codes: [B, T, D]; correct: [B] bool (prediction == label).  Returns
    group means, Welch t-test p-value, and Cohen's d.
    """
    from scipy import stats

    B = codes.shape[0]
    disc = np.array([
        boundary_discontinuity(codes[b : b + 1], window, overlap)["discontinuity"]
        for b in range(B)
    ])
    correct = np.asarray(correct, bool)
    disc_ok, disc_err = disc[correct], disc[~correct]
    if len(disc_ok) < 2 or len(disc_err) < 2:
        return {
            "mean_disc_correct": float(disc_ok.mean()) if len(disc_ok) else 0.0,
            "mean_disc_incorrect": float(disc_err.mean()) if len(disc_err) else 0.0,
            "t_statistic": 0.0,
            "p_value": 1.0,
            "cohens_d": 0.0,
        }
    t_stat, p_val = stats.ttest_ind(disc_err, disc_ok, equal_var=False)
    return {
        "mean_disc_correct": float(disc_ok.mean()),
        "mean_disc_incorrect": float(disc_err.mean()),
        "t_statistic": float(t_stat),
        "p_value": float(p_val),
        "cohens_d": _cohens_d(disc_err, disc_ok),
    }


def transient_spike_stats(codes: np.ndarray) -> Dict[str, float]:
    """Transient-spike + variance failure-mode statistics
    (reference: analyze_temporal_failure_modes).

    A 'spike' is a feature active for exactly one frame with inactive
    neighbors.
    """
    a = np.asarray(codes) > 0
    prev = np.concatenate([np.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    nxt = np.concatenate([a[:, 1:], np.zeros_like(a[:, :1])], axis=1)
    spikes = a & ~prev & ~nxt
    active = a.sum()
    acts = np.asarray(codes)
    return {
        "spike_fraction": float(spikes.sum() / max(active, 1)),
        "spikes_per_frame": float(spikes.sum(-1).mean()),
        "activation_variance": float(acts[acts > 0].var()) if active else 0.0,
        "mean_jaccard": float(jaccard_consecutive(codes).mean()),
    }


def discriminative_transients_probe(
    codes: np.ndarray,
    labels: np.ndarray,
    lifetime_threshold: Optional[float] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """Are the discriminative features transient or persistent?

    Trains logistic probes on time-pooled activations restricted to
    (a) transient features, (b) persistent features, (c) all features, and
    compares cross-validated accuracy.
    """
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import cross_val_score

    codes = np.asarray(codes)
    # labels often arrive float64 (pandas / np.loadtxt): cast so
    # class-count logic works; use unique counts, not bincount, so label
    # vocabularies like {1, 2} don't pick up a phantom empty 0-bin
    labels = np.asarray(labels).astype(np.int64)
    if lifetime_threshold is None:
        lifetime_threshold = codes.shape[1] / 4

    split = transient_persistent_split(codes, lifetime_threshold)
    pooled = codes.mean(axis=1)  # [B, D]
    _, class_counts = np.unique(labels, return_counts=True)

    def probe_acc(mask: np.ndarray) -> float:
        if mask.sum() == 0 or len(class_counts) < 2:
            return 0.5
        x = pooled[:, mask]
        clf = LogisticRegression(max_iter=1000, random_state=seed)
        folds = min(3, int(class_counts.min()))
        if folds < 2:
            return 0.5
        return float(cross_val_score(clf, x, labels, cv=folds).mean())

    return {
        "n_transient": int(split["transient"].sum()),
        "n_persistent": int(split["persistent"].sum()),
        "acc_transient_only": probe_acc(split["transient"]),
        "acc_persistent_only": probe_acc(split["persistent"]),
        "acc_all": probe_acc(split["ever_active"]),
        "lifetime_threshold": float(lifetime_threshold),
    }


def global_cue_consistency(codes: np.ndarray, top_k: int = 20) -> Dict[str, float]:
    """Utterance-global cue overlap (reference:
    analyze_global_cue_consistency.py compute_global_metrics): for each
    utterance, the top-k features by total activation form the global cue
    set; consistency = mean Jaccard between each frame's active set and
    the global set, plus cross-utterance global-set overlap."""
    codes = np.asarray(codes)
    B, T, D = codes.shape
    totals = codes.sum(axis=1)  # [B, D]
    k = min(top_k, D)
    global_sets = np.argsort(-totals, axis=-1)[:, :k]

    frame_overlap = []
    for b in range(B):
        gset = set(global_sets[b].tolist())
        a = codes[b] > 0
        for t in range(T):
            active = set(np.flatnonzero(a[t]).tolist())
            union = active | gset
            if union:
                frame_overlap.append(len(active & gset) / len(union))

    cross = []
    for i in range(B):
        for j in range(i + 1, B):
            si, sj = set(global_sets[i].tolist()), set(global_sets[j].tolist())
            cross.append(len(si & sj) / len(si | sj))

    return {
        "frame_to_global_jaccard": float(np.mean(frame_overlap)) if frame_overlap else 1.0,
        "cross_utterance_global_jaccard": float(np.mean(cross)) if cross else 1.0,
        "top_k": float(k),
    }
