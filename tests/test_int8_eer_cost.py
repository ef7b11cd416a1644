"""Accuracy cost of int8 serving, measured at a trained operating point.

r3 recorded the int8 speed win (1.14× end-to-end for scope='ffn') with
an UNquantified accuracy cost: the known ~0.01 max score deviation was
never tied to an EER/t-DCF statement because no trained model existed
to check against.  This trains the tiny detector to a separable
operating point on the synthetic tone-vs-noise task (the same recipe as
test_detector_train), scores a held-out set through the exact-fp path
and both int8 scopes with the SAME parameters, and asserts the metrics
the serving decision rides on:

  - EER identical across fp / int8-ffn / int8-all
  - min t-DCF identical (at a fixed plausible ASV operating point)
  - zero decision flips at the P(bonafide)=0.5 boundary
  - the score perturbation is small relative to the class margin
    (the guard that makes the rank-statistic equalities meaningful)

The go/no-go rule this encodes (also in docs/BENCH_NOTES_r4.json):
int8 may be a serving default for a given checkpoint only when a
held-out scoring pass shows ΔEER = 0 and decision flips = 0 vs the fp
path; until then bf16 stays the headline config (bench.py default).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.config import SAEConfig, tiny_xlsr_config
from sls_tpu.metrics.eer import DEFAULT_COST_MODEL, compute_eer, compute_tdcf
from sls_tpu.models.detector import Detector
from sls_tpu.train.steps import create_train_state, make_eval_step, make_train_step
from tests.test_detector_train import (
    WAV_LEN,
    synthetic_batch,
    tiny_experiment,
    tiny_model_config,
)

# fixed plausible ASV operating point for the tandem DCF (the synthetic
# task has no ASV system; only DELTAS across precision paths matter)
ASV_POINT = dict(p_fa=0.05, p_miss=0.05, p_fa_spoof=0.30)


def _min_tdcf(bona, spoof):
    curve, _ = compute_tdcf(
        bona, spoof, ASV_POINT["p_fa"], ASV_POINT["p_miss"],
        ASV_POINT["p_fa_spoof"], DEFAULT_COST_MODEL,
    )
    return float(np.min(curve))


@pytest.fixture(scope="module")
def trained_params():
    """Train the tiny detector until the held-out EER is 0."""
    cfg = tiny_experiment()
    model = Detector(cfg.model)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, WAV_LEN)))
    step = make_train_step(model, cfg)
    data_rng = np.random.default_rng(0)
    for _ in range(40):
        wav, labels = synthetic_batch(data_rng, 16)
        state, _ = step(state, wav, labels, jnp.ones(16, bool), rng)
    return cfg, state.params


def _score(cfg, params, wav, **encoder_overrides):
    mcfg = dataclasses.replace(
        cfg.model,
        encoder=dataclasses.replace(cfg.model.encoder, **encoder_overrides),
    )
    ecfg = dataclasses.replace(cfg, model=mcfg)
    eval_step = make_eval_step(Detector(mcfg), ecfg)
    return np.asarray(eval_step(params, wav)["score"], np.float64)


def test_int8_eer_and_tdcf_cost(trained_params):
    cfg, params = trained_params
    heldout_rng = np.random.default_rng(99)
    wav, labels = synthetic_batch(heldout_rng, 64)
    labels = np.asarray(labels)

    s_fp = _score(cfg, params, wav)
    s_ffn = _score(cfg, params, wav, int8_serving=True, int8_scope="ffn")
    s_all = _score(cfg, params, wav, int8_serving=True, int8_scope="all")

    bona_fp, spoof_fp = s_fp[labels == 1], s_fp[labels == 0]
    eer_fp = compute_eer(bona_fp, spoof_fp)[0]
    assert eer_fp == 0.0, (
        f"training did not reach a separable operating point (EER "
        f"{eer_fp:.3f}) — the quantization deltas below would be "
        f"meaningless"
    )
    tdcf_fp = _min_tdcf(bona_fp, spoof_fp)

    margin = float(bona_fp.min() - spoof_fp.max())
    assert margin > 0

    report = {}
    for name, s in (("ffn", s_ffn), ("all", s_all)):
        d = np.abs(s - s_fp)
        eer_q = compute_eer(s[labels == 1], s[labels == 0])[0]
        tdcf_q = _min_tdcf(s[labels == 1], s[labels == 0])
        flips = int(((s > 0.5) != (s_fp > 0.5)).sum())
        report[name] = dict(
            max_abs_dscore=float(d.max()), eer=eer_q, tdcf=tdcf_q,
            flips=flips,
        )
        # quantization noise must sit well inside the class margin,
        # otherwise the equalities below are luck, not headroom
        assert d.max() < 0.25 * margin, (
            f"int8-{name}: score shift {d.max():.4f} vs margin "
            f"{margin:.4f}"
        )
        assert eer_q == eer_fp, f"int8-{name} moved EER: {report}"
        assert tdcf_q == pytest.approx(tdcf_fp, abs=1e-12), (
            f"int8-{name} moved min t-DCF: {report}"
        )
        assert flips == 0, f"int8-{name} flipped decisions: {report}"

    # printed for bench-notes capture
    print(f"int8 accuracy cost @ margin {margin:.4f}: {report}")
