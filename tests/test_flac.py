"""Native FLAC decoder tests: roundtrip against the test encoder."""

import numpy as np
import pytest

from sls_tpu.data.flac import decode_batch, read_flac
from sls_tpu.data.audio import load_audio
from tests.flac_encoder import encode_flac


def _int16_sine(n, freq=440.0, amp=0.4, sr=16000):
    t = np.arange(n) / sr
    return np.round(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int64)


def _write(tmp_path, name, blob):
    p = tmp_path / name
    p.write_bytes(blob)
    return p


def _expected_float(ch):
    return ch.astype(np.float32) / 32768.0


class TestRoundtrip:
    def test_verbatim_mono(self, tmp_path):
        ch = _int16_sine(5000)
        p = _write(tmp_path, "v.flac", encode_flac([ch], mode="verbatim"))
        out = read_flac(p)
        assert out.shape == (5000,)
        np.testing.assert_allclose(out, _expected_float(ch), atol=1e-6)

    def test_constant(self, tmp_path):
        ch = np.full(3000, -1234, np.int64)
        p = _write(tmp_path, "c.flac", encode_flac([ch], mode="constant"))
        out = read_flac(p)
        np.testing.assert_allclose(out, _expected_float(ch), atol=1e-6)

    @pytest.mark.parametrize("order", [0, 1, 2])
    @pytest.mark.parametrize("rice", [0, 3, 7])
    def test_fixed_rice(self, tmp_path, order, rice):
        rng = np.random.default_rng(order * 10 + rice)
        # smooth signal so fixed-order residuals stay small
        ch = np.cumsum(rng.integers(-50, 51, size=4000)).astype(np.int64)
        ch = np.clip(ch, -30000, 30000)
        p = _write(
            tmp_path, "f.flac",
            encode_flac([ch], mode="fixed", fixed_order=order, rice=rice),
        )
        out = read_flac(p)
        np.testing.assert_allclose(out, _expected_float(ch), atol=1e-6)

    def test_multi_frame(self, tmp_path):
        ch = _int16_sine(10000)
        p = _write(tmp_path, "m.flac",
                   encode_flac([ch], mode="verbatim", block_size=1024))
        out = read_flac(p)
        assert out.shape == (10000,)
        np.testing.assert_allclose(out, _expected_float(ch), atol=1e-6)

    def test_stereo_downmix(self, tmp_path):
        left = _int16_sine(2000, freq=440)
        right = _int16_sine(2000, freq=880)
        p = _write(tmp_path, "s.flac",
                   encode_flac([left, right], mode="verbatim"))
        out = read_flac(p)
        expected = (_expected_float(left) + _expected_float(right)) / 2
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_load_audio_dispatch(self, tmp_path):
        ch = _int16_sine(1000)
        p = _write(tmp_path, "d.flac", encode_flac([ch]))
        out = load_audio(p)
        np.testing.assert_allclose(out, _expected_float(ch), atol=1e-6)


class TestRobustness:
    def test_invalid_magic_raises(self, tmp_path):
        p = _write(tmp_path, "bad.flac", b"NOPE" + b"\x00" * 100)
        with pytest.raises(ValueError):
            read_flac(p)

    def test_truncated_file_salvages_or_raises(self, tmp_path):
        ch = _int16_sine(8000)
        blob = encode_flac([ch], mode="verbatim", block_size=1024)
        p = _write(tmp_path, "t.flac", blob[: len(blob) // 2])
        try:
            out = read_flac(p)
            # salvaged prefix must be correct as far as it goes
            n = out.shape[0]
            assert n < 8000
            if n:
                np.testing.assert_allclose(out, _expected_float(ch)[:n],
                                           atol=1e-6)
        except ValueError:
            pass  # full failure is also acceptable -> zero-fallback upstream

    def test_load_audio_zero_fallback(self, tmp_path):
        p = _write(tmp_path, "z.flac", b"fLaC" + b"\xff" * 8)
        out = load_audio(p)
        assert out.shape == (0,)


class TestBatchDecode:
    def test_batch_pad_tile_and_fallback(self, tmp_path):
        short = _int16_sine(1000)
        long = _int16_sine(9000)
        p1 = _write(tmp_path, "a.flac", encode_flac([short]))
        p2 = _write(tmp_path, "b.flac", encode_flac([long]))
        missing = tmp_path / "missing.flac"

        cut = 4000
        out = decode_batch([p1, p2, missing], cut, n_threads=4)
        assert out.shape == (3, cut)
        exp_short = np.tile(_expected_float(short), 4)[:cut]
        np.testing.assert_allclose(out[0], exp_short, atol=1e-6)
        np.testing.assert_allclose(out[1], _expected_float(long)[:cut],
                                   atol=1e-6)
        assert np.all(out[2] == 0)
