"""Overlap-evaluation tests: joint score+stability pass and full-utterance
windowed scoring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.config import SAEConfig
from sls_tpu.data.pipeline import ArrayLoader
from sls_tpu.evaluation.overlap import (
    extract_windows,
    overlap_stability_eval,
    score_full_utterance,
)
from sls_tpu.models.detector import Detector
from tests.test_detector_train import WAV_LEN, synthetic_batch, tiny_model_config


@pytest.fixture(scope="module")
def overlap_model():
    cfg = tiny_model_config(
        sae=SAEConfig(activation_dim=64, dict_size=256, k=32,
                      variant="window_overlap", window_size=8),
    )
    model = Detector(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, WAV_LEN)))["params"]
    return model, params


def test_overlap_stability_eval(overlap_model):
    model, params = overlap_model
    rng = np.random.default_rng(0)
    wav, y = synthetic_batch(rng, 16)
    utt_ids = [f"U{i}" for i in range(16)]
    labels = {u: int(l) for u, l in zip(utt_ids, np.asarray(y))}
    loader = ArrayLoader(np.asarray(wav), None, utt_ids=utt_ids, batch_size=8)

    res = overlap_stability_eval(model, params, loader, window=8,
                                 labels=labels)
    assert res["num_samples"] == 16
    assert len(res["scores"]) == 16
    ts = res["temporal_stability"]
    assert 0 <= ts["boundary"] <= 1 and 0 <= ts["interior"] <= 1
    assert "eer_pct" in res and 0 <= res["eer_pct"] <= 100


def test_extract_windows_geometry():
    wav = np.arange(10000, dtype=np.float32)
    wins = extract_windows(wav, window=4000, stride=2000)
    assert wins.shape == (4, 4000)
    np.testing.assert_array_equal(wins[0], wav[:4000])
    np.testing.assert_array_equal(wins[-1], wav[6000:])  # right-aligned tail
    # short audio: one tiled window
    short = extract_windows(np.ones(1000, np.float32), window=4000)
    assert short.shape == (1, 4000)
    assert np.all(short == 1.0)


def test_score_full_utterance(overlap_model):
    model, params = overlap_model
    rng = np.random.default_rng(1)
    long_wav = rng.normal(0, 0.1, 3500).astype(np.float32)
    out = score_full_utterance(model, params, long_wav, window=WAV_LEN,
                               stride=WAV_LEN // 2, batch_size=4)
    assert out["n_windows"] == 6  # (3500-1000)/500+1=6
    assert out["window_scores"].shape == (6,)
    assert 0 <= out["score"] <= 1
    # min aggregation <= mean aggregation
    out_min = score_full_utterance(model, params, long_wav, window=WAV_LEN,
                                   stride=WAV_LEN // 2, batch_size=4,
                                   aggregate="min")
    assert out_min["score"] <= out["score"] + 1e-7


class TestUnwindowedScoring:
    """Un-windowed full-utterance scoring: one forward with the whole
    clip in attention context (the long-T capability the reference's
    eval_overlap family approximates with 50%-overlap windows)."""

    def test_buckets_and_order(self, overlap_model):
        from sls_tpu.evaluation.overlap import (
            length_buckets,
            score_utterances_unwindowed,
        )
        from tests.test_detector_train import tiny_model_config

        model, params = overlap_model
        enc = tiny_model_config().encoder
        buckets = length_buckets(enc, t_targets=(64, 128))
        assert sorted(buckets) == [64, 128]

        rng = np.random.default_rng(5)
        clips = [
            ("short", rng.normal(0, 0.1, 800).astype(np.float32)),
            ("mid", rng.normal(0, 0.1, 2000).astype(np.float32)),
            ("long", rng.normal(0, 0.1, 7000).astype(np.float32)),
        ]
        out = list(score_utterances_unwindowed(
            model, params, iter(clips), enc, t_targets=(64, 128)))
        assert [u for u, _, _ in out] == ["short", "mid", "long"]
        for _, s, _ in out:
            assert 0.0 <= s <= 1.0
        # short -> smallest bucket; mid -> second; long -> chunked at max
        assert out[0][2] == 64
        assert out[1][2] == 128
        assert out[2][2] == 128

    def test_matches_direct_forward(self, overlap_model):
        """A clip exactly at a bucket length scores identically to a
        plain model forward (no windowing artifacts)."""
        from sls_tpu.evaluation.overlap import (
            length_buckets,
            score_utterances_unwindowed,
        )
        from tests.test_detector_train import tiny_model_config

        model, params = overlap_model
        enc = tiny_model_config().encoder
        buckets = length_buckets(enc, t_targets=(64,))
        size = buckets[64]
        rng = np.random.default_rng(7)
        wav = rng.normal(0, 0.1, size).astype(np.float32)
        ((_, score, t),) = list(score_utterances_unwindowed(
            model, params, [("u", wav)], enc, t_targets=(64,)))
        direct = float(model.apply(
            {"params": params}, jnp.asarray(wav[None]), train=False
        )["score"][0])
        assert t == 64
        assert score == pytest.approx(direct, abs=1e-6)
