"""Decision-relevance attribution over SAE features.

Functional replacement for the reference's Phase-1 decision-cue analysis
(reference: analyze_decision_relevance.py:44-161 gradient + ablation
attribution; :164-386 cue stability/consistency).  The reference had to
re-stitch the forward pass by hand to get gradients w.r.t. SAE
activations; here the Detector exposes ``classify_codes`` so attribution
is a one-line ``jax.grad``, and ablation is a vmapped batch of masked
forwards instead of K sequential loops.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gradient_attribution(model, params, codes: jnp.ndarray) -> np.ndarray:
    """d(logit_bona - logit_spoof) / d codes — [B, T, D].

    codes: sparse SAE activations [B, T, D].  The logit difference is the
    decision margin; positive attribution = pushes toward bonafide.
    """

    def margin(c):
        logp = model.apply(
            {"params": params}, c, method="classify_codes"
        )
        return (logp[:, 1] - logp[:, 0]).sum()

    return np.asarray(jax.grad(margin)(codes))


def attribution_scores(model, params, codes: jnp.ndarray) -> np.ndarray:
    """Per-feature decision relevance: |grad x activation| summed over
    time (gradient-times-input), [B, D]."""
    grads = gradient_attribution(model, params, codes)
    return np.abs(grads * np.asarray(codes)).sum(axis=1)


def ablation_attribution(
    model, params, codes: jnp.ndarray, feature_ids: np.ndarray,
    batch_features: int = 256,
) -> np.ndarray:
    """Causal attribution: zero feature d everywhere, measure the drop in
    P(bonafide).  Returns [B, len(feature_ids)].

    The reference runs one forward per ablated feature in a Python loop
    (analyze_decision_relevance.py:96-161); here features are vmapped in
    chunks so the MXU sees batched work.
    """
    codes = jnp.asarray(codes)

    base_p = np.exp(np.asarray(model.apply(
        {"params": params}, codes, method="classify_codes"
    ))[:, 1])

    @jax.jit
    def ablate_chunk(feat_chunk):
        def one(fid):
            masked = codes * (1 - jax.nn.one_hot(fid, codes.shape[-1]))
            logp = model.apply({"params": params}, masked,
                               method="classify_codes")
            return jnp.exp(logp[:, 1])

        return jax.vmap(one)(feat_chunk)  # [F, B]

    deltas = []
    ids = np.asarray(feature_ids)
    for lo in range(0, len(ids), batch_features):
        chunk = jnp.asarray(ids[lo : lo + batch_features])
        p = np.asarray(ablate_chunk(chunk))  # [F, B]
        deltas.append(base_p[None, :] - p)
    return np.concatenate(deltas, axis=0).T  # [B, F]


def top_k_cues(scores: np.ndarray, k: int = 20) -> np.ndarray:
    """Indices of the k most decision-relevant features per sample."""
    return np.argsort(-scores, axis=-1)[:, :k]


def cue_jaccard_stability(cues_a: np.ndarray, cues_b: np.ndarray) -> float:
    """Mean Jaccard overlap between two top-k cue sets per sample
    (reference: DecisionCueStabilityAnalyzer,
    analyze_decision_relevance.py:164)."""
    sims = []
    for a, b in zip(cues_a, cues_b):
        sa, sb = set(a.tolist()), set(b.tolist())
        union = len(sa | sb)
        sims.append(len(sa & sb) / union if union else 1.0)
    return float(np.mean(sims))


def within_class_cue_consistency(
    cues: np.ndarray, labels: np.ndarray
) -> Dict[str, float]:
    """Average pairwise cue overlap within bonafide and spoof groups
    (reference: CueConsistencyAnalyzer,
    analyze_decision_relevance.py:324)."""

    def group_overlap(group: np.ndarray) -> float:
        if len(group) < 2:
            return 1.0
        sets = [set(c.tolist()) for c in group]
        sims = []
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                union = len(sets[i] | sets[j])
                sims.append(len(sets[i] & sets[j]) / union if union else 1.0)
        return float(np.mean(sims))

    labels = np.asarray(labels)
    n_pair = int(min((labels == 1).sum(), (labels == 0).sum()))
    return {
        "bonafide_consistency": group_overlap(cues[labels == 1]),
        "spoof_consistency": group_overlap(cues[labels == 0]),
        # single-class inputs have no cross-class pairs: report 0.0
        # rather than np.mean([]) = NaN leaking into JSON reports
        "cross_class_overlap": (
            cue_jaccard_stability(
                cues[labels == 1][:n_pair], cues[labels == 0][:n_pair]
            )
            if n_pair > 0
            else 0.0
        ),
    }
