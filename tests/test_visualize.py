"""Smoke tests for the PNG dashboard builders."""

from pathlib import Path

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


def _codes(B=6, T=32, D=64, seed=0):
    rng = np.random.default_rng(seed)
    acts = rng.gamma(1.0, 1.0, (B, T, D)).astype(np.float32)
    mask = rng.random((B, T, D)) < 0.1
    return acts * mask


def test_boundary_discontinuity_png(tmp_path):
    from sls_tpu.analysis.visualize import plot_boundary_discontinuity

    codes = _codes()
    correct = np.asarray([1, 1, 0, 1, 0, 1], bool)
    p = plot_boundary_discontinuity(codes, 8,
                                    tmp_path / "bd.png", correct=correct)
    assert Path(p).stat().st_size > 1000
    # without correctness labels: 2-panel variant
    p2 = plot_boundary_discontinuity(codes, 8, tmp_path / "bd2.png")
    assert Path(p2).stat().st_size > 1000


def test_attribution_report_png(tmp_path):
    from sls_tpu.analysis.visualize import plot_attribution_report

    rng = np.random.default_rng(1)
    scores = np.abs(rng.normal(size=(12, 64)))
    p = plot_attribution_report(
        scores, tmp_path / "attr.png", top_k=8,
        consistency={"within_bonafide": 0.8, "within_spoof": 0.7,
                     "cross_class": 0.3},
        ablation={"features": [1, 5, 9], "mean_prob_drop": [0.2, 0.1, 0.05]},
    )
    assert Path(p).stat().st_size > 1000
    # minimal variant (no consistency/ablation)
    p2 = plot_attribution_report(scores, tmp_path / "attr2.png")
    assert Path(p2).stat().st_size > 1000


def test_acoustic_probe_png(tmp_path):
    from sls_tpu.analysis.visualize import plot_acoustic_probe

    probe = {
        "pitch": {"top_features": [3, 7], "top_correlations": [0.8, 0.5]},
        "rms": {"top_features": [1, 2], "top_correlations": [-0.6, 0.4]},
        "zcr": {"top_features": [9], "top_correlations": [0.3]},
    }
    p = plot_acoustic_probe(probe, tmp_path / "probe.png")
    assert Path(p).stat().st_size > 1000


def test_transient_persistent_png(tmp_path):
    from sls_tpu.analysis.visualize import plot_transient_persistent

    rng = np.random.default_rng(2)
    lifetime = np.where(rng.random(128) < 0.3, 0.0,
                        rng.gamma(2.0, 3.0, 128))
    p = plot_transient_persistent(
        lifetime, 4.0, tmp_path / "tp.png",
        probe_acc={"acc_transient_only": 0.6, "acc_persistent_only": 0.75,
                   "acc_all": 0.8},
    )
    assert Path(p).stat().st_size > 1000
