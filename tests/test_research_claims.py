"""Replication of the reference's headline research claims on synthetic
data (reference: test_overlapping_windows.py:9-115, which constructs a
small SAE, feeds random inputs and checks boundary-discontinuity bands;
research_summary_table.md rows 8-9, 26-28)."""

import jax
import jax.numpy as jnp
import numpy as np

from sls_tpu.analysis.temporal import (
    boundary_discontinuity,
    feature_lifetimes,
    mean_temporal_jaccard,
)
from sls_tpu.config import SAEConfig
from sls_tpu.sae.topk import TopKSAE


def _codes_for(variant, window, x, seed=0):
    cfg = SAEConfig(activation_dim=128, dict_size=512, k=64,
                    variant=variant, window_size=window)
    sae = TopKSAE(cfg)
    params = sae.init(jax.random.PRNGKey(seed), x)
    return np.asarray(sae.apply(params, x, method="encode"))


def test_overlap_reduces_boundary_discontinuity():
    """The reference's core claim: 50%-overlap vote windows cut the
    boundary discontinuity of hard windows (~25% -> ~6-8% band on random
    inputs; we assert the ordering and a generous band)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 128)).astype(np.float32))
    w = 8

    hard = _codes_for("window_hard", w, x)
    overlap = _codes_for("window_overlap", w, x)

    d_hard = boundary_discontinuity(hard, w)["discontinuity"]
    d_overlap = boundary_discontinuity(overlap, w, overlap=True)["discontinuity"]

    assert d_hard > 0.10  # hard windows break hard at boundaries
    # overlap voting cuts the discontinuity by more than half (the
    # reference reports ~25% -> ~6-8% at its input scale; on pure-noise
    # inputs the absolute level is higher but the ratio is the claim)
    assert d_overlap < d_hard / 2


def test_window_variants_raise_stability_over_per_timestep():
    """Jaccard stability and lifetimes: per-timestep < windowed
    (reference: 77.2% -> 84.9% Jaccard; 8.6 -> 67.2-frame lifetimes)."""
    rng = np.random.default_rng(1)
    # temporally correlated inputs (random walk) so windowing has signal
    steps = rng.normal(size=(4, 32, 128)).astype(np.float32) * 0.3
    x = jnp.asarray(np.cumsum(steps, axis=1))

    pt = _codes_for("per_timestep", 1, x)
    win = _codes_for("window_hard", 8, x)

    assert mean_temporal_jaccard(win) > mean_temporal_jaccard(pt)
    assert (
        feature_lifetimes(win)["mean_lifetime"]
        > feature_lifetimes(pt)["mean_lifetime"]
    )
