"""Smoke tests for the PNG dashboard builders."""

import numpy as np

from sls_tpu.analysis.importance import per_feature_class_stats
from sls_tpu.analysis.temporal import jaccard_consecutive
from sls_tpu.analysis.visualize import (
    plot_decision_features,
    plot_feature_statistics,
    plot_temporal_stability,
)


def test_feature_statistics_png(tmp_path):
    rng = np.random.default_rng(0)
    codes = np.maximum(rng.normal(size=(6, 20, 64)), 0).astype(np.float32)
    labels = np.array([1, 0, 1, 0, 1, 0])
    stats = per_feature_class_stats(codes, labels)
    out = plot_feature_statistics(stats, tmp_path / "feat.png")
    assert (tmp_path / "feat.png").stat().st_size > 1000


def test_temporal_stability_png(tmp_path):
    rng = np.random.default_rng(1)
    codes = np.maximum(rng.normal(size=(4, 40, 32)), 0).astype(np.float32)
    trace = jaccard_consecutive(codes)
    lifetimes = rng.exponential(5, 200)
    out = plot_temporal_stability(trace, 8, tmp_path / "stab.png", lifetimes)
    assert (tmp_path / "stab.png").stat().st_size > 1000


def test_decision_features_png(tmp_path):
    rng = np.random.default_rng(2)
    wav = rng.normal(0, 0.1, 16000).astype(np.float32)
    codes = np.maximum(rng.normal(size=(50, 64)), 0).astype(np.float32)
    out = plot_decision_features(wav, codes, [1, 5, 9], tmp_path / "dec.png")
    assert (tmp_path / "dec.png").stat().st_size > 1000
