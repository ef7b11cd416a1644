"""Tests for protocol parsing, pad/tile, WAV IO, and score files."""

import os
import wave

import numpy as np
import pytest

from sls_tpu.data.audio import pad_or_tile, read_wav, load_audio
from sls_tpu.data.protocols import (
    parse_eval_list,
    parse_train_protocol,
    parse_train_protocol_full,
)
from sls_tpu.scores.writer import ScoreWriter, read_score_file

REF_DB = "/root/reference/database/ASVspoof_DF_cm_protocols"


def test_pad_crop_long():
    x = np.arange(100000, dtype=np.float32)
    out = pad_or_tile(x, 64600)
    assert out.shape == (64600,)
    np.testing.assert_array_equal(out, x[:64600])


def test_pad_tile_short():
    x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    out = pad_or_tile(x, 8)
    np.testing.assert_array_equal(out, [1, 2, 3, 1, 2, 3, 1, 2])


def test_pad_tile_matches_reference_semantics():
    # reference: np.tile(x, (1, max_len // len + 1))[:, :max_len][0]
    rng = np.random.default_rng(0)
    for n in [1, 7, 999, 64599, 64600, 64601]:
        x = rng.normal(size=n).astype(np.float32)
        expected = np.tile(x, (1, 64600 // n + 1))[:, :64600][0] if n < 64600 else x[:64600]
        np.testing.assert_array_equal(pad_or_tile(x, 64600), expected)


def test_pad_empty_returns_zeros():
    out = pad_or_tile(np.zeros(0, dtype=np.float32), 100)
    assert out.shape == (100,)
    assert np.all(out == 0)


def test_parse_train_protocol(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(
        "LA_0079 LA_T_1138215 - - bonafide\n"
        "LA_0079 LA_T_1271820 - A01 spoof\n"
        "\n"
        "LA_0080 LA_T_9999999 - - bonafide\n"
    )
    labels, utts = parse_train_protocol(p)
    assert utts == ["LA_T_1138215", "LA_T_1271820", "LA_T_9999999"]
    assert labels == {"LA_T_1138215": 1, "LA_T_1271820": 0, "LA_T_9999999": 1}

    entries = parse_train_protocol_full(p)
    assert entries[1].system_id == "A01"
    assert entries[1].label == 0
    assert entries[0].speaker == "LA_0079"


def test_parse_eval_list(tmp_path):
    p = tmp_path / "eval.txt"
    p.write_text("LA_E_1000048\nLA_E_1000166\n\n0.wav\n")
    assert parse_eval_list(p) == ["LA_E_1000048", "LA_E_1000166", "0.wav"]


@pytest.mark.skipif(not os.path.isdir(REF_DB), reason="reference protocols absent")
def test_parse_shipped_protocols():
    labels, utts = parse_train_protocol(
        os.path.join(REF_DB, "ASVspoof2019.LA.cm.train.trn.txt")
    )
    assert len(utts) == 25380
    n_bona = sum(labels[u] for u in utts)
    assert n_bona == 2580  # known 2019-LA train class balance
    eval_ids = parse_eval_list(os.path.join(REF_DB, "ASVspoof2021.LA.cm.eval.trl.txt"))
    assert len(eval_ids) == 181566
    wild = parse_eval_list(os.path.join(REF_DB, "in_the_wild.eval.txt"))
    assert len(wild) == 31779
    assert wild[0].endswith(".wav")


def test_wav_roundtrip(tmp_path):
    path = tmp_path / "t.wav"
    rng = np.random.default_rng(1)
    samples = (rng.uniform(-0.5, 0.5, size=1600) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    out = read_wav(path)
    np.testing.assert_allclose(out, samples.astype(np.float32) / 32768.0)
    # load_audio dispatch
    out2 = load_audio(path)
    np.testing.assert_array_equal(out, out2)


def test_wav_stereo_downmix(tmp_path):
    path = tmp_path / "s.wav"
    left = np.full(100, 8192, dtype="<i2")
    right = np.full(100, -8192, dtype="<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    out = read_wav(path)
    np.testing.assert_allclose(out, np.zeros(100), atol=1e-7)


def test_score_writer_roundtrip(tmp_path):
    path = tmp_path / "scores.txt"
    with ScoreWriter(path) as w:
        w.write_batch(["a", "b"], [0.5, -1.25])
        w.write_batch(["c"], [3.0])
    ids, scores = read_score_file(path)
    assert ids == ["a", "b", "c"]
    np.testing.assert_allclose(scores, [0.5, -1.25, 3.0])
    # overwrite semantics (reference deletes stale eval output, main.py:646-649)
    with ScoreWriter(path) as w:
        w.write_batch(["x"], [1.0])
    ids, _ = read_score_file(path)
    assert ids == ["x"]


def test_parse_protocol_rejects_unknown_labels(tmp_path):
    """Silently mapping unknown tokens to spoof corrupts training labels
    — anything outside {bonafide, spoof} must raise with context."""
    import pytest

    p = tmp_path / "bad.txt"
    p.write_text("LA_0001 LA_T_1 - - Bonafide\n")  # capitalized
    with pytest.raises(ValueError, match="unknown label token"):
        parse_train_protocol(p)
    p.write_text("LA_0001 LA_T_1 - A01 genuine\n")
    with pytest.raises(ValueError, match="unknown label token"):
        parse_train_protocol_full(p)


def test_parse_protocol_full_reports_column_count(tmp_path):
    import pytest

    p = tmp_path / "trunc.txt"
    p.write_text("LA_0001 LA_T_1 bonafide\n")
    with pytest.raises(ValueError, match="expected 5 columns, got 3"):
        parse_train_protocol_full(p)
