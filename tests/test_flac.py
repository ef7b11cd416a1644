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
        # corrupt-but-present: zero-fallback (a MISSING file raises,
        # TestMissingFiles)
        corrupt = _write(tmp_path, "corrupt.flac", b"junk, not flac")

        cut = 4000
        out = decode_batch([p1, p2, corrupt], cut, n_threads=4)
        assert out.shape == (3, cut)
        exp_short = np.tile(_expected_float(short), 4)[:cut]
        np.testing.assert_allclose(out[0], exp_short, atol=1e-6)
        np.testing.assert_allclose(out[1], _expected_float(long)[:cut],
                                   atol=1e-6)
        assert np.all(out[2] == 0)


class TestRateHandling:
    def test_batch_resamples_off_rate_files(self, tmp_path):
        """A 8 kHz FLAC in a batch must come back resampled to 16 kHz,
        not silently at the wrong rate (the reference's librosa path
        always resampled, data_utils_SSL.py:87)."""
        sr = 8000
        n = 2000
        t = np.arange(n) / sr
        ch = np.round(0.4 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int64)
        p_off = _write(tmp_path, "off.flac", encode_flac([ch], sample_rate=sr))
        ch16 = _int16_sine(4000)
        p_ok = _write(tmp_path, "ok.flac", encode_flac([ch16]))

        cut = 4000
        out = decode_batch([p_off, p_ok], cut, n_threads=2)
        # the resampled row should contain a 440 Hz tone at 16 kHz: its
        # dominant FFT bin must match 440 Hz at the 16 kHz interpretation
        spec = np.abs(np.fft.rfft(out[0]))
        freq = np.fft.rfftfreq(cut, d=1.0 / 16000.0)
        assert abs(freq[int(np.argmax(spec))] - 440.0) < 10.0
        # and the in-rate row is untouched
        np.testing.assert_allclose(out[1], _expected_float(ch16), atol=1e-6)

    def test_batch_rate_check_disabled(self, tmp_path):
        sr = 8000
        ch = _int16_sine(2000, sr=sr)
        p = _write(tmp_path, "off2.flac", encode_flac([ch], sample_rate=sr))
        out = decode_batch([p], 2000, target_sr=0)
        # raw decode: the samples ARE the 8 kHz stream, tiled
        np.testing.assert_allclose(out[0], _expected_float(ch), atol=1e-6)


class TestFuzzRegression:
    """Corrupt/truncated input corpus: the decoder must fail cleanly
    (zero rows / exceptions), never crash or return garbage lengths
    (an earlier UB bug was caught ad hoc; this is the regression net)."""

    def _corpus(self, tmp_path):
        good = encode_flac([_int16_sine(3000)])
        rng = np.random.default_rng(0)
        cases = {
            "empty.flac": b"",
            "magic_only.flac": b"fLaC",
            "bad_magic.flac": b"OggS" + good[4:],
            "trunc_header.flac": good[:20],
            "trunc_frame.flac": good[: len(good) // 2],
            "trunc_1byte.flac": good[:-1],
            "random.flac": rng.bytes(4096),
            "good_plus_garbage.flac": good + rng.bytes(64),
            "zeroed_streaminfo.flac": good[:8] + b"\x00" * 30 + good[38:],
            "bitflips.flac": bytes(
                b ^ (1 if i % 997 == 0 else 0) for i, b in enumerate(good)
            ),
        }
        return [_write(tmp_path, name, blob) for name, blob in cases.items()]

    def test_corrupt_corpus_read_flac(self, tmp_path):
        from sls_tpu.data.flac import read_flac_rate

        for p in self._corpus(tmp_path):
            try:
                wav, rate = read_flac_rate(p)
                # salvage is allowed, garbage is not
                assert wav.dtype == np.float32
                assert 0 <= wav.size <= 16000 * 600
                assert np.all(np.isfinite(wav))
                assert np.all(np.abs(wav) <= 1.0 + 1e-6)
            except ValueError:
                pass  # clean failure

    def test_corrupt_corpus_batch(self, tmp_path):
        paths = self._corpus(tmp_path)
        cut = 1000
        out = decode_batch(paths, cut, n_threads=4)
        assert out.shape == (len(paths), cut)
        assert np.all(np.isfinite(out))
        assert np.all(np.abs(out) <= 1.0 + 1e-6)


class TestBatchDecodeInt16:
    """Native int16 wire output (slsaudio_decode_batch_rates_i16)."""

    def test_matches_float_path_exactly(self, tmp_path):
        from sls_tpu.data.pipeline import to_wire

        short = _int16_sine(1000)
        long = _int16_sine(9000)
        p1 = _write(tmp_path, "a.flac", encode_flac([short]))
        p2 = _write(tmp_path, "b.flac", encode_flac([long]))
        corrupt = _write(tmp_path, "corrupt.flac", b"junk, not flac")

        cut = 4000
        out_f = decode_batch([p1, p2, corrupt], cut, n_threads=4)
        out_i = decode_batch([p1, p2, corrupt], cut, n_threads=4,
                             dtype="int16")
        assert out_i.dtype == np.int16
        # C++ lrintf and numpy rint agree (round-half-even), and 16-bit
        # sources are exactly representable: bitwise match incl. the
        # pad/tile rows and the zero corrupt-fallback row
        np.testing.assert_array_equal(out_i, to_wire(out_f, "int16"))
        assert np.all(out_i[2] == 0)

    def test_off_rate_row_resampled_and_quantized(self, tmp_path):
        sr = 8000
        n = 2000
        t = np.arange(n) / sr
        ch = np.round(0.4 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int64)
        p_off = _write(tmp_path, "off.flac", encode_flac([ch], sample_rate=sr))
        cut = 4000
        out = decode_batch([p_off], cut, dtype="int16")
        assert out.dtype == np.int16
        spec = np.abs(np.fft.rfft(out[0].astype(np.float64)))
        freq = np.fft.rfftfreq(cut, d=1.0 / 16000.0)
        assert abs(freq[int(np.argmax(spec))] - 440.0) < 10.0

    def test_unknown_dtype_rejected(self, tmp_path):
        p = _write(tmp_path, "c.flac", encode_flac([_int16_sine(100)]))
        with pytest.raises(ValueError):
            decode_batch([p], 100, dtype="int8")


class TestMissingFiles:
    """Missing audio is an infrastructure failure and must RAISE —
    the corrupt-file zero-fallback only covers files that exist
    (silently zero-filling a wrong --database_path would train/score
    a whole run on silence)."""

    def test_read_flac_rate_missing(self, tmp_path):
        from sls_tpu.data.flac import read_flac_rate

        with pytest.raises(FileNotFoundError):
            read_flac_rate(tmp_path / "nope.flac")

    def test_decode_batch_missing_raises(self, tmp_path):
        missing = [tmp_path / f"gone_{i}.flac" for i in range(3)]
        with pytest.raises(FileNotFoundError, match="do not exist"):
            decode_batch(missing, 1000, n_threads=2)

    def test_decode_batch_corrupt_but_present_still_zero_fills(self, tmp_path):
        bad = tmp_path / "bad.flac"
        bad.write_bytes(b"not a flac file at all")
        out = decode_batch([bad], 1000, n_threads=1)
        assert out.shape == (1, 1000)
        assert np.all(out == 0)
