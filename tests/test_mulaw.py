"""mu-law 8-bit wire: codec correctness + measured accuracy gate.

The mu-law wire (data/mulaw.py) is the only LOSSY wire format, so it
carries the same burden of proof as int8 serving
(tests/test_int8_eer_cost.py): the quantization must be shown — not
assumed — to leave the detection metrics unchanged at a trained
operating point before anyone serves with it.
"""

import dataclasses

import numpy as np
import pytest

from sls_tpu.data.mulaw import (
    lut_from_int16,
    mulaw_decode,
    mulaw_encode,
    mulaw_from_int16,
)
from sls_tpu.data.pipeline import to_wire


def speech_like(n=16000, seed=0):
    """Tone stack + noise at conversational amplitude."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = (
        0.25 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * np.sin(2 * np.pi * 1310 * t + 0.7)
        + 0.02 * rng.normal(size=n)
    )
    return np.clip(x, -1, 1).astype(np.float32)


class TestCodec:
    def test_round_trip_snr(self):
        x = speech_like()
        err = mulaw_decode(mulaw_encode(x)) - x
        snr_db = 10 * np.log10(np.mean(x**2) / np.mean(err**2))
        # G.711-class companding: ~35-38 dB for speech-band signals
        assert snr_db > 33.0, snr_db

    def test_better_than_8bit_linear_for_quiet_audio(self):
        """The point of companding: small amplitudes keep resolution."""
        x = 0.02 * speech_like(seed=1)
        err_mu = mulaw_decode(mulaw_encode(x)) - x
        x_lin = np.clip(np.rint(x * 128), -128, 127) / 128.0
        err_lin = x_lin - x
        assert np.mean(err_mu**2) < np.mean(err_lin**2) / 10

    def test_encode_monotonic_and_saturating(self):
        xs = np.linspace(-1.5, 1.5, 20001).astype(np.float32)
        u = mulaw_encode(xs).astype(np.int32)
        assert np.all(np.diff(u) >= 0)
        assert u[0] == 0 and u[-1] == 255
        # zero maps to the midpoint code and decodes to ~0
        assert abs(mulaw_decode(mulaw_encode(np.zeros(1)))[0]) < 1e-4

    def test_lut_matches_formula_exactly(self):
        i16 = np.array([-32768, -12345, -1, 0, 1, 777, 32767], np.int16)
        np.testing.assert_array_equal(
            mulaw_from_int16(i16),
            mulaw_encode(i16.astype(np.float32) / 32768.0),
        )
        assert lut_from_int16().shape == (65536,)
        assert lut_from_int16().dtype == np.uint8

    def test_device_decode_matches_numpy_decode(self):
        """train/steps.dequantize_wire's uint8 branch must equal
        mulaw_decode — the two implementations are the wire contract."""
        import jax.numpy as jnp

        from sls_tpu.train.steps import dequantize_wire

        u = np.arange(256, dtype=np.uint8)
        dev = np.asarray(dequantize_wire(jnp.asarray(u)))
        # fp32 expm1/ordering differences only: ~1e-7 relative near |1.0|
        np.testing.assert_allclose(dev, mulaw_decode(u), rtol=0, atol=2e-6)

    def test_to_wire_dispatch(self):
        x = speech_like(n=64)[None]
        w = to_wire(x, "mulaw")
        assert w.dtype == np.uint8 and w.shape == x.shape
        np.testing.assert_array_equal(w, mulaw_encode(x))


class TestLoaderIntegration:
    def test_flac_batch_loader_mulaw(self, tmp_path):
        """FLAC -> native int16 decode -> LUT companding -> uint8 wire,
        and the decoded audio matches the direct float encode within
        one code (int16 grid vs continuous input)."""
        from sls_tpu.data.pipeline import BatchLoader, DatasetIndex
        from tests.flac_encoder import encode_flac

        x = np.clip(speech_like(4000) * 32767, -32768, 32767).astype(
            np.int16
        )
        p = tmp_path / "a.flac"
        p.write_bytes(encode_flac([x]))
        index = DatasetIndex(utt_ids=["a"], paths=[p])
        loader = BatchLoader(index, 1, cut=4000, wire_dtype="mulaw",
                             num_threads=1)
        batch = next(iter(loader.epoch(0)))
        assert batch.wav.dtype == np.uint8
        expect = mulaw_from_int16(np.tile(x, 1)[:4000][None])
        np.testing.assert_array_equal(batch.wav, expect)


class TestAccuracyGate:
    @pytest.mark.slow
    def test_mulaw_eer_cost_at_trained_operating_point(self):
        """Same gate as int8 serving: at a separable trained operating
        point, mu-law wire must show ΔEER = 0 and zero decision flips,
        with the score perturbation recorded against the class margin."""
        import jax
        import jax.numpy as jnp

        from sls_tpu.metrics.eer import compute_eer
        from sls_tpu.models.detector import Detector
        from sls_tpu.train.steps import (
            create_train_state,
            make_eval_step,
            make_train_step,
        )
        from tests.test_detector_train import (
            WAV_LEN,
            synthetic_batch,
            tiny_experiment,
        )

        cfg = tiny_experiment()
        model = Detector(cfg.model)
        rng = jax.random.PRNGKey(0)
        state = create_train_state(model, cfg, rng, jnp.zeros((2, WAV_LEN)))
        step = make_train_step(model, cfg)
        data_rng = np.random.default_rng(0)
        for _ in range(40):
            wav, labels = synthetic_batch(data_rng, 16)
            state, _ = step(state, wav, labels, jnp.ones(16, bool), rng)

        eval_step = make_eval_step(model, cfg)
        hold_wav, hold_y = synthetic_batch(np.random.default_rng(7), 64)
        hold_np = np.asarray(hold_wav, np.float32)

        s_float = np.asarray(
            eval_step(state.params, jnp.asarray(hold_np))["score"],
            np.float64)
        s_mulaw = np.asarray(
            eval_step(
                state.params, jnp.asarray(to_wire(hold_np, "mulaw"))
            )["score"], np.float64)

        y = np.asarray(hold_y)
        eer_f, _ = compute_eer(s_float[y == 1], s_float[y == 0])
        eer_m, _ = compute_eer(s_mulaw[y == 1], s_mulaw[y == 0])
        margin = float(s_float[y == 1].min() - s_float[y == 0].max())
        assert margin > 0.2, f"operating point not separable ({margin})"
        assert eer_m == eer_f == 0.0
        flips = int(np.sum((s_float > 0.5) != (s_mulaw > 0.5)))
        assert flips == 0
        max_dev = float(np.max(np.abs(s_float - s_mulaw)))
        # recorded bound: the wire noise must sit well inside the margin
        assert max_dev < margin / 4, (max_dev, margin)
