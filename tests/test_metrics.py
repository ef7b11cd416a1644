"""Unit + golden tests for the DET/EER/t-DCF metrics layer.

Golden tests compare against the reference's vendored official scorer
(/root/reference/eval_metric_LA.py) when present; invariant tests are
self-contained and always run.
"""

import importlib.util
import os

import numpy as np
import pytest

from sls_tpu.metrics.eer import (
    DEFAULT_COST_MODEL,
    asv_error_rates,
    compute_det_curve,
    compute_eer,
    compute_tdcf,
    roc_eer,
)

REF_METRICS = "/root/reference/eval_metric_LA.py"


def _load_reference_metrics():
    spec = importlib.util.spec_from_file_location("ref_em", REF_METRICS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_det_curve_hand_case():
    # targets clearly above nontargets -> perfect separation at some threshold
    frr, far, thr = compute_det_curve(np.array([3.0, 4.0]), np.array([1.0, 2.0]))
    assert frr.shape == far.shape == thr.shape == (5,)
    assert frr[0] == 0.0 and far[0] == 1.0
    # there is an operating point with frr=0, far=0
    assert np.min(np.abs(frr - far)) == 0.0
    eer, _ = compute_eer(np.array([3.0, 4.0]), np.array([1.0, 2.0]))
    assert eer == 0.0


def test_eer_symmetric_overlap():
    # fully interleaved scores -> EER 50%
    rng = np.random.default_rng(0)
    s = rng.normal(size=4000)
    eer, _ = compute_eer(s[:2000], s[2000:])
    assert abs(eer - 0.5) < 0.05


def test_eer_monotone_in_separation():
    rng = np.random.default_rng(1)
    base_non = rng.normal(size=1000)
    base_tar = rng.normal(size=1000)
    eers = []
    for sep in [0.0, 1.0, 2.0, 4.0]:
        eer, _ = compute_eer(base_tar + sep, base_non)
        eers.append(eer)
    assert all(a >= b for a, b in zip(eers, eers[1:]))


def test_asv_error_rates_hand_case():
    tar = np.array([0.9, 0.8, 0.2])
    non = np.array([0.1, 0.6])
    spoof = np.array([0.7, 0.3, 0.4, 0.9])
    p_fa, p_miss, p_miss_spoof, p_fa_spoof = asv_error_rates(tar, non, spoof, 0.5)
    assert p_fa == pytest.approx(1 / 2)
    assert p_miss == pytest.approx(1 / 3)
    assert p_miss_spoof == pytest.approx(2 / 4)
    assert p_fa_spoof == pytest.approx(2 / 4)


def test_tdcf_perfect_cm_hits_floor():
    """A perfect CM reaches the C0-driven floor; tDCF_norm max is >= 1."""
    bona = np.linspace(5, 6, 50)
    spoof = np.linspace(0, 1, 50)
    curve, _ = compute_tdcf(bona, spoof, 0.02, 0.03, 0.3, DEFAULT_COST_MODEL)
    c0 = (
        DEFAULT_COST_MODEL["Ptar"] * DEFAULT_COST_MODEL["Cmiss"] * 0.03
        + DEFAULT_COST_MODEL["Pnon"] * DEFAULT_COST_MODEL["Cfa"] * 0.02
    )
    c1 = DEFAULT_COST_MODEL["Ptar"] * DEFAULT_COST_MODEL["Cmiss"] - c0
    c2 = DEFAULT_COST_MODEL["Pspoof"] * DEFAULT_COST_MODEL["Cfa_spoof"] * 0.3
    floor = c0 / (c0 + min(c1, c2))
    assert np.min(curve) == pytest.approx(floor)


def test_roc_eer_degenerate_inputs():
    assert roc_eer(np.array([]), np.array([])) == 50.0
    assert roc_eer(np.array([1.0, 2.0]), np.array([1, 1])) == 50.0
    assert roc_eer(np.array([np.nan, np.nan]), np.array([0, 1])) == 50.0
    # constant model: all-equal scores must report chance level, not the
    # 100% the raw DET sweep's tie-breaking would produce
    assert roc_eer(np.full(10, 0.5), np.arange(10) % 2) == 50.0


def test_roc_eer_separable():
    scores = np.array([0.9, 0.8, 0.1, 0.2])
    labels = np.array([1, 1, 0, 0])
    assert roc_eer(scores, labels) == 0.0


@pytest.mark.skipif(not os.path.exists(REF_METRICS), reason="reference absent")
class TestGoldenAgainstReference:
    def setup_method(self):
        self.ref = _load_reference_metrics()

    def test_det_curve_matches(self):
        rng = np.random.default_rng(42)
        tar = rng.normal(1.0, 1.0, size=500)
        non = rng.normal(-1.0, 1.2, size=700)
        frr, far, thr = compute_det_curve(tar, non)
        rfrr, rfar, rthr = self.ref.compute_det_curve(tar, non)
        np.testing.assert_allclose(frr, rfrr)
        np.testing.assert_allclose(far, rfar)
        np.testing.assert_allclose(thr, rthr)

    def test_eer_matches(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            tar = rng.normal(0.5, 1.0, size=300)
            non = rng.normal(-0.5, 0.8, size=400)
            eer, thr = compute_eer(tar, non)
            ref_eer, ref_thr = self.ref.compute_eer(tar, non)
            assert eer == pytest.approx(float(ref_eer))
            assert thr == pytest.approx(float(ref_thr))

    def test_tdcf_matches(self):
        rng = np.random.default_rng(3)
        bona = rng.normal(1.0, 1.0, size=400)
        spoof = rng.normal(-1.0, 1.0, size=600)
        p_fa, p_miss, p_fa_spoof = 0.0173, 0.0542, 0.31
        curve, thr = compute_tdcf(
            bona, spoof, p_fa, p_miss, p_fa_spoof, DEFAULT_COST_MODEL
        )
        cost_model = dict(DEFAULT_COST_MODEL)
        ref_curve, ref_thr = self.ref.compute_tDCF(
            bona, spoof, p_fa, p_miss, p_fa_spoof, cost_model, False
        )
        np.testing.assert_allclose(curve, ref_curve)
        np.testing.assert_allclose(thr, ref_thr)
        assert float(np.min(curve)) == pytest.approx(float(np.min(ref_curve)))
