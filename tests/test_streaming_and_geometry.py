"""Tests: streamed full-utterance scoring, geometric median, full-length
(64,600-sample / 201-frame) integration, loader error propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.evaluation.overlap import score_utterances_streamed
from sls_tpu.sae.geometry import geometric_median
from tests.test_detector_train import tiny_model_config


class TestStreamedScoring:
    @pytest.fixture(scope="class")
    def model(self):
        from sls_tpu.models.detector import Detector

        cfg = tiny_model_config()
        model = Detector(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 1000)))[
            "params"
        ]
        return model, params

    def test_streams_variable_lengths(self, model):
        m, params = model
        rng = np.random.default_rng(0)
        clips = [
            ("short", rng.normal(0, 0.1, 600).astype(np.float32)),   # 1 window
            ("exact", rng.normal(0, 0.1, 1000).astype(np.float32)),  # 1 window
            ("long", rng.normal(0, 0.1, 2600).astype(np.float32)),   # several
            ("longer", rng.normal(0, 0.1, 4100).astype(np.float32)),
        ]
        results = dict(
            score_utterances_streamed(
                m, params, iter(clips), window=1000, stride=500, batch_size=4
            )
        )
        assert set(results) == {"short", "exact", "long", "longer"}
        assert all(0 <= s <= 1 for s in results.values())

    def test_matches_per_utterance_scoring(self, model):
        from sls_tpu.evaluation.overlap import score_full_utterance

        m, params = model
        rng = np.random.default_rng(1)
        wav = rng.normal(0, 0.1, 3000).astype(np.float32)
        single = score_full_utterance(
            m, params, wav, window=1000, stride=500, batch_size=4
        )
        streamed = dict(
            score_utterances_streamed(
                m, params, [("u", wav)], window=1000, stride=500, batch_size=4
            )
        )
        assert streamed["u"] == pytest.approx(single["score"], abs=1e-5)


def test_geometric_median():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (200, 8)).astype(np.float32) + 3.0
    med = np.asarray(geometric_median(jnp.asarray(pts)))
    assert med.shape == (8,)
    # near the center of a symmetric cloud
    np.testing.assert_allclose(med, 3.0, atol=0.3)
    # robust to outliers: mean moves, median stays
    pts_out = np.concatenate([pts, np.full((10, 8), 1000.0, np.float32)])
    med_out = np.asarray(geometric_median(jnp.asarray(pts_out)))
    mean_out = pts_out.mean(0)
    assert np.abs(med_out - 3.0).max() < 1.0
    assert np.abs(mean_out - 3.0).max() > 10.0


def test_full_length_201_frame_path():
    """The production 64,600-sample crop with the real 7-conv topology
    (tiny channel dims): exactly 201 frames, overlap windows run."""
    from sls_tpu.config import ModelConfig, SAEConfig, tiny_xlsr_config
    from sls_tpu.models.detector import Detector

    enc = tiny_xlsr_config(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 3, 2), (32, 3, 2),
                     (32, 3, 2), (32, 2, 2), (32, 2, 2)),
    )
    assert enc.num_frames(64600) == 201
    cfg = ModelConfig(
        encoder=enc,
        sae=SAEConfig(activation_dim=64, dict_size=256, k=32,
                      variant="window_overlap", window_size=8),
        classifier_hidden=32,
    )
    model = Detector(cfg)
    wav = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.1, (2, 64600)), jnp.float32
    )
    out = model.apply(model.init(jax.random.PRNGKey(0), wav), wav)
    assert out["codes"].shape == (2, 201, 256)
    assert np.isfinite(float(out["sae_loss"]))
    assert float(out["sae_loss"]) > 0


def test_loader_surfaces_decode_errors(tmp_path):
    """A crashing decode thread propagates instead of hanging."""
    from sls_tpu.data.pipeline import BatchLoader, DatasetIndex

    # .xyz suffix -> load_audio raises ValueError inside the worker;
    # unsupported-format errors are NOT zero-fallback (only corrupt data is)
    index = DatasetIndex(
        utt_ids=["a"], paths=[tmp_path / "a.xyz"], labels=np.array([0])
    )
    (tmp_path / "a.xyz").write_bytes(b"junk")
    loader = BatchLoader(index, batch_size=1, cut=100)
    with pytest.raises(Exception):
        list(loader.epoch(0))
