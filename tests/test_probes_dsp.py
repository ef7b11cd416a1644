"""Tests for the DSP primitives, probes, and the SLS parity model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.analysis.dsp import (
    acoustic_features,
    mel_filterbank,
    mel_spectrogram,
    mfcc,
    stft_mag,
)
from sls_tpu.analysis.probes import (
    acoustic_probe,
    handcrafted_stability_comparison,
    parse_phn_file,
    phoneme_frame_labels,
    phoneme_probe,
)

SR = 16000


def tone(freq, n=16000, amp=0.5):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestDSP:
    def test_stft_peak_at_tone_frequency(self):
        spec = stft_mag(tone(1000), n_fft=512)
        freqs = np.fft.rfftfreq(512, 1 / SR)
        peak = freqs[spec.mean(0).argmax()]
        assert abs(peak - 1000) < 40

    def test_mel_filterbank_shape_and_coverage(self):
        fb = mel_filterbank(SR, 512, 40)
        assert fb.shape == (40, 257)
        assert np.all(fb >= 0)
        # every filter has support
        assert np.all(fb.sum(axis=1) > 0)

    def test_mel_spectrogram_discriminates_tones(self):
        low = mel_spectrogram(tone(300)).mean(0)
        high = mel_spectrogram(tone(4000)).mean(0)
        assert low.argmax() < high.argmax()

    def test_mfcc_shape_finite(self):
        m = mfcc(tone(440), n_mfcc=13)
        assert m.shape[1] == 13
        assert np.all(np.isfinite(m))

    def test_acoustic_features(self):
        x = tone(200, n=16000)
        feats = acoustic_features(x)
        T = len(feats["rms"])
        for v in feats.values():
            assert v.shape == (T,)
        # pitch detector finds the 200 Hz tone on voiced frames
        voiced = feats["pitch"][feats["pitch"] > 0]
        assert len(voiced) > T // 2
        assert abs(np.median(voiced) - 200) < 10
        # centroid of a 200 Hz tone is low; of noise is high
        noise = np.random.default_rng(0).normal(0, 0.3, 16000).astype(np.float32)
        nf = acoustic_features(noise)
        assert feats["spectral_centroid"].mean() < nf["spectral_centroid"].mean()
        assert feats["zcr"].mean() < nf["zcr"].mean()
        # silence -> zero rms and unvoiced
        sil = acoustic_features(np.zeros(16000, np.float32))
        assert sil["rms"].max() < 1e-6


class TestAcousticProbe:
    def test_probe_finds_planted_correlation(self):
        rng = np.random.default_rng(0)
        B, S = 4, 16000
        wavs = np.stack([
            tone(150 + 100 * b, n=S) * (0.2 + 0.2 * b) for b in range(B)
        ])
        T = len(acoustic_features(wavs[0])["rms"])
        D = 32
        codes = rng.uniform(0, 0.1, (B, T, D)).astype(np.float32)
        # plant feature 5 = RMS trajectory
        for b in range(B):
            codes[b, :, 5] = acoustic_features(wavs[b])["rms"]
        out = acoustic_probe(codes, wavs)
        assert out["rms"]["top_features"][0] == 5
        assert out["rms"]["top_correlations"][0] > 0.9


class TestPhonemeProbe:
    def test_phn_parse_and_alignment(self, tmp_path):
        p = tmp_path / "a.PHN"
        p.write_text("0 3200 sil\n3200 9600 aa\n9600 16000 s\n")
        segs = parse_phn_file(p)
        assert segs == [(0, 3200, "sil"), (3200, 9600, "aa"), (9600, 16000, "s")]
        labels = phoneme_frame_labels(segs, n_frames=49)
        # frame centers: 160, 480, ... frame 9 center=3040 (sil), frame 10
        # center=3360 (aa)
        assert labels[9] == "sil"
        assert labels[10] == "aa"
        assert labels[30] == "s"

    def test_phoneme_selectivity(self):
        rng = np.random.default_rng(1)
        B, T, D = 2, 40, 16
        codes = rng.uniform(0, 0.05, (B, T, D)).astype(np.float32)
        labels = []
        for b in range(B):
            lab = ["aa"] * 20 + ["s"] * 20
            codes[b, :20, 3] += 1.0  # feature 3 fires on 'aa'
            codes[b, 20:, 7] += 1.0  # feature 7 fires on 's'
            labels.append(lab)
        out = phoneme_probe(codes, labels)
        assert out["aa"]["top_features"][0] == 3
        assert out["s"]["top_features"][0] == 7
        assert out["aa"]["n_frames"] == 40


def test_handcrafted_comparison_runs():
    rng = np.random.default_rng(2)
    B, S = 2, 16000
    wavs = np.stack([tone(300 + 200 * b, n=S) for b in range(B)])
    T = mel_spectrogram(wavs[0]).shape[0]
    codes = np.zeros((B, T, 64), np.float32)
    codes[:, :, :8] = rng.uniform(0.1, 1, (B, T, 8))  # very stable SAE
    out = handcrafted_stability_comparison(codes, wavs)
    assert set(out) == {"sae", "mel", "mfcc"}
    for rep in out.values():
        assert 0 <= rep["mean_jaccard"] <= 1
    assert out["sae"]["mean_jaccard"] == 1.0  # constant support


class TestSLSModel:
    def test_sls_forward_and_train_step(self):
        from sls_tpu.config import ExperimentConfig, ModelConfig, TrainConfig, tiny_xlsr_config
        from sls_tpu.models.sls import (
            SLSDetector,
            create_sls_train_state,
            make_sls_eval_step,
            make_sls_train_step,
        )

        cfg = ExperimentConfig(
            model=ModelConfig(encoder=tiny_xlsr_config(), use_sae=False),
            train=TrainConfig(batch_size=4, lr=1e-3, cut_length=1000),
        )
        model = SLSDetector(cfg.model)
        wav = jnp.asarray(
            np.random.default_rng(0).normal(0, 0.1, (4, 1000)), jnp.float32
        )
        state = create_sls_train_state(model, cfg, jax.random.PRNGKey(0), wav[:2])
        assert "first_bn" in state.batch_stats["sls_head"]

        step = make_sls_train_step(model, cfg, mesh=None)
        labels = jnp.asarray([0, 1, 0, 1])
        valid = jnp.ones(4, bool)
        prev_bn = np.asarray(state.batch_stats["sls_head"]["first_bn"]["mean"]).copy()
        state, metrics = step(state, wav, labels, valid, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # batch stats updated
        assert not np.allclose(
            np.asarray(state.batch_stats["sls_head"]["first_bn"]["mean"]), prev_bn
        )

        eval_step = make_sls_eval_step(model, mesh=None)
        out = eval_step(state.params, state.batch_stats, wav)
        assert out["score"].shape == (4,)
        np.testing.assert_allclose(
            np.exp(np.asarray(out["log_probs"])).sum(-1), 1.0, atol=1e-5
        )

    def test_sls_learns(self):
        from sls_tpu.config import ExperimentConfig, ModelConfig, TrainConfig, tiny_xlsr_config
        from sls_tpu.models.sls import (
            SLSDetector, create_sls_train_state, make_sls_train_step,
        )
        from tests.test_detector_train import synthetic_batch

        cfg = ExperimentConfig(
            model=ModelConfig(encoder=tiny_xlsr_config(), use_sae=False),
            train=TrainConfig(batch_size=16, lr=1e-3, cut_length=1000),
        )
        model = SLSDetector(cfg.model)
        state = create_sls_train_state(
            model, cfg, jax.random.PRNGKey(0), jnp.zeros((2, 1000))
        )
        step = make_sls_train_step(model, cfg, mesh=None)
        rng = np.random.default_rng(0)
        losses = []
        valid = jnp.ones(16, bool)
        for _ in range(10):
            wav, labels = synthetic_batch(rng, 16)
            state, m = step(state, wav, labels, valid, jax.random.PRNGKey(2))
            losses.append(float(m["loss"]))
        assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_sls_layer_gate_profile():
    from sls_tpu.config import ExperimentConfig, ModelConfig, TrainConfig, tiny_xlsr_config
    from sls_tpu.models.sls import (
        SLSDetector, create_sls_train_state, layer_gate_profile,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(encoder=tiny_xlsr_config(), use_sae=False),
        train=TrainConfig(batch_size=4, cut_length=1000),
    )
    model = SLSDetector(cfg.model)
    wav = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.1, (4, 1000)), jnp.float32
    )
    state = create_sls_train_state(model, cfg, jax.random.PRNGKey(0), wav[:2])
    out = layer_gate_profile(model, state.params, state.batch_stats, wav)
    L = cfg.model.encoder.encoder_layers
    assert len(out["mean_gate_per_layer"]) == L
    assert all(0 <= g <= 1 for g in out["mean_gate_per_layer"])
    assert len(out["most_sensitive_layers"]) == min(5, L)
