"""RawBoost equivalence tests.

Deterministic sub-parts are compared against scipy to float tolerance;
composed ops (different RNG draw order than the reference) are validated
statistically and for determinism-given-key.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from sls_tpu.augment.rawboost import (
    _freqz_peak,
    apply_rawboost,
    filter_fir,
    firwin_bandstop,
    isd_additive_noise,
    lnl_convolutive_noise,
    norm_wav,
    rawboost_batch,
    ssi_additive_noise,
)
from sls_tpu.config import RawBoostConfig

FS = 16000.0
CFG = RawBoostConfig()


class TestFirwin:
    @pytest.mark.parametrize(
        "c,f1,f2",
        [(11, 100.0, 900.0), (51, 500.0, 2500.0), (99, 20.0, 7900.0),
         (21, 1000.0, 1100.0)],
    )
    def test_matches_scipy(self, c, f1, f2):
        ours = np.asarray(firwin_bandstop(jnp.asarray(c), jnp.asarray(f1),
                                          jnp.asarray(f2), FS, max_taps=102))
        ref = signal.firwin(c, [f1, f2], window="hamming", fs=FS)
        np.testing.assert_allclose(ours[:c], ref, atol=1e-6)
        assert np.all(ours[c:] == 0)


class TestFilterFir:
    def test_matches_reference_group_delay_trim(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=1000).astype(np.float32)
        b = signal.firwin(31, [300.0, 3000.0], window="hamming", fs=FS).astype(
            np.float32
        )
        # reference semantics: pad by N=len(b)+1, lfilter, trim N/2 each side
        n = b.shape[0] + 1
        xpad = np.pad(x, (0, n))
        y_ref = signal.lfilter(b, 1, xpad)[n // 2 : xpad.shape[0] - n // 2]

        b_buf = np.zeros(512, np.float32)
        b_buf[:31] = b
        y = np.asarray(filter_fir(jnp.asarray(x), jnp.asarray(b_buf),
                                  jnp.asarray(31)))
        np.testing.assert_allclose(y, y_ref, atol=1e-4)


def test_freqz_peak_matches_scipy():
    rng = np.random.default_rng(1)
    taps = np.zeros(512, np.float32)
    taps[:77] = rng.normal(size=77).astype(np.float32)
    _, h = signal.freqz(taps[:77], 1, fs=FS)
    ref_peak = np.max(np.abs(h))
    peak = float(_freqz_peak(jnp.asarray(taps)))
    assert peak == pytest.approx(ref_peak, rel=1e-4)


def test_norm_wav():
    x = jnp.asarray([0.5, -2.0, 1.0])
    np.testing.assert_allclose(np.asarray(norm_wav(x, False)),
                               [0.25, -1.0, 0.5], atol=1e-7)
    y = jnp.asarray([0.25, -0.5])
    np.testing.assert_allclose(np.asarray(norm_wav(y, False)),
                               [0.25, -0.5], atol=1e-7)  # peak <= 1: untouched
    np.testing.assert_allclose(np.asarray(norm_wav(y, True)),
                               [0.5, -1.0], atol=1e-7)  # always


class TestISD:
    def test_modified_fraction_and_determinism(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 0.1, size=20000).astype(np.float32))
        fracs = []
        for seed in range(5):
            y = isd_additive_noise(jax.random.PRNGKey(seed), x, CFG)
            changed = np.mean(np.asarray(y) != np.asarray(x))
            assert changed <= CFG.P / 100.0 + 0.01
            fracs.append(changed)
        # beta ~ U(0, P): average modified fraction ~ P/200
        assert 0.01 < np.mean(fracs) < 0.10
        y1 = isd_additive_noise(jax.random.PRNGKey(7), x, CFG)
        y2 = isd_additive_noise(jax.random.PRNGKey(7), x, CFG)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestSSI:
    def test_snr_in_configured_range(self):
        rng = np.random.default_rng(3)
        x_np = rng.normal(0, 0.1, size=16000).astype(np.float32)
        x = jnp.asarray(x_np)
        for seed in range(3):
            y = ssi_additive_noise(jax.random.PRNGKey(seed), x, CFG, FS)
            noise = np.asarray(y) - x_np
            snr = 20 * np.log10(
                np.linalg.norm(x_np) / (np.linalg.norm(noise) + 1e-12)
            )
            assert CFG.SNRmin - 0.5 <= snr <= CFG.SNRmax + 0.5


class TestLnL:
    def test_output_properties(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(0, 0.1, size=8000).astype(np.float32))
        y = np.asarray(lnl_convolutive_noise(jax.random.PRNGKey(0), x, CFG, FS))
        assert y.shape == x.shape
        assert np.all(np.isfinite(y))
        assert abs(y.mean()) < 1e-4  # mean-removed
        assert np.max(np.abs(y)) <= 1.0 + 1e-5  # peak-bounded
        # output carries signal energy and differs from the input
        assert np.std(y) > 1e-4
        assert not np.allclose(y, np.asarray(x))


class TestDispatchAndBatch:
    @pytest.mark.parametrize("algo", [0, 2, 3, 5, 7, 8])
    def test_algos_run(self, algo):
        import dataclasses

        cfg = dataclasses.replace(CFG, algo=algo, N_f=2, nBands=2)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 0.1, size=4000).astype(np.float32))
        y = apply_rawboost(jax.random.PRNGKey(0), x, cfg, FS)
        assert np.all(np.isfinite(np.asarray(y)))
        if algo == 0:
            np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_batch_jit_per_example_keys(self):
        import dataclasses

        cfg = dataclasses.replace(CFG, algo=3, nBands=2)
        rng = np.random.default_rng(6)
        wavs = jnp.asarray(rng.normal(0, 0.1, size=(4, 4000)).astype(np.float32))
        out = rawboost_batch(jax.random.PRNGKey(0), wavs, cfg, FS)
        assert out.shape == wavs.shape
        # different per-example keys -> rows augmented differently even for
        # identical inputs
        same = jnp.tile(wavs[:1], (4, 1))
        out2 = np.asarray(rawboost_batch(jax.random.PRNGKey(1), same, cfg, FS))
        assert not np.allclose(out2[0], out2[1])
        # deterministic given key
        out3 = np.asarray(rawboost_batch(jax.random.PRNGKey(0), wavs, cfg, FS))
        np.testing.assert_array_equal(np.asarray(out), out3)
