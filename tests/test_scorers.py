"""Integration tests for the official-scorer CLIs on synthetic key files.

Builds miniature organizer key packages in the exact column layout of the
ASVspoof 2021 releases (reference: evaluate_2021_LA.py:18-21,40-47) and
checks EER / min t-DCF end to end, including the sign-inversion check.
"""

import os

import numpy as np
import pytest

from sls_tpu.scores.evaluate import (
    score_2021_df,
    score_2021_la,
    score_in_the_wild,
    main as scorer_main,
)
from sls_tpu.scores.writer import ScoreWriter


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def la_truth(tmp_path):
    """Miniature LA truth dir: ASV keys/scores + CM keys, phase 'eval'."""
    rng = np.random.default_rng(0)
    truth = tmp_path / "keys"

    # ASV trials: 8 cols; col 5 = target/nontarget/spoof, col 7 = phase
    n_tar, n_non, n_spf = 40, 40, 40
    asv_rows, asv_scores = [], []
    for i in range(n_tar):
        asv_rows.append(f"spk a_t{i} c d e target f eval")
        asv_scores.append(f"x y {rng.normal(2.0, 1.0)}")
    for i in range(n_non):
        asv_rows.append(f"spk a_n{i} c d e nontarget f eval")
        asv_scores.append(f"x y {rng.normal(-2.0, 1.0)}")
    for i in range(n_spf):
        asv_rows.append(f"spk a_s{i} c d e spoof f eval")
        asv_scores.append(f"x y {rng.normal(0.0, 1.0)}")
    _write_lines(str(truth / "LA/ASV/trial_metadata.txt"), asv_rows)
    _write_lines(str(truth / "LA/ASV/ASVTorch_Kaldi/score.txt"), asv_scores)

    # CM trials: col 1 = utt id, col 5 = bonafide/spoof, col 7 = phase
    cm_rows = []
    utts, labels = [], []
    for i in range(50):
        u = f"LA_E_{i:07d}"
        lab = "bonafide" if i % 2 == 0 else "spoof"
        cm_rows.append(f"spk {u} c d e {lab} f eval")
        utts.append(u)
        labels.append(lab)
    _write_lines(str(truth / "LA/CM/trial_metadata.txt"), cm_rows)
    return truth, utts, labels


def _emit_scores(tmp_path, utts, labels, separation, rng=None):
    rng = rng or np.random.default_rng(1)
    path = tmp_path / "scores.txt"
    scores = [
        (separation if lab == "bonafide" else -separation) + rng.normal(0, 0.3)
        for lab in labels
    ]
    with ScoreWriter(path) as w:
        w.write_batch(utts, scores)
    return str(path)


def test_la_scoring_separable(la_truth, tmp_path):
    truth, utts, labels = la_truth
    score_file = _emit_scores(tmp_path, utts, labels, separation=5.0)
    res = score_2021_la(score_file, str(truth), "eval")
    assert res.eer == 0.0
    assert res.min_tdcf is not None and 0.0 <= res.min_tdcf < 1.0
    assert not res.inverted_is_better
    assert "min_tDCF" in res.summary() and "eer: 0.00" in res.summary()


def test_la_scoring_detects_swapped_labels(la_truth, tmp_path):
    truth, utts, labels = la_truth
    flipped = ["spoof" if l == "bonafide" else "bonafide" for l in labels]
    score_file = _emit_scores(tmp_path, utts, flipped, separation=5.0)
    res = score_2021_la(score_file, str(truth), "eval")
    assert res.inverted_is_better


def test_la_scoring_trial_count_mismatch(la_truth, tmp_path):
    truth, utts, labels = la_truth
    score_file = _emit_scores(tmp_path, utts[:10], labels[:10], 5.0)
    with pytest.raises(ValueError, match="expected trials"):
        score_2021_la(score_file, str(truth), "eval")


def test_df_scoring(tmp_path):
    utts = [f"DF_E_{i:07d}" for i in range(40)]
    labels = ["bonafide" if i % 2 else "spoof" for i in range(40)]
    cm_rows = [f"a {u} c d e {lab} f eval" for u, lab in zip(utts, labels)]
    _write_lines(str(tmp_path / "keys/CM/trial_metadata.txt"), cm_rows)
    score_file = _emit_scores(tmp_path, utts, labels, separation=4.0)
    res = score_2021_df(score_file, str(tmp_path / "keys"), "eval")
    assert res.eer == 0.0
    assert res.min_tdcf is None


def test_in_the_wild_scoring(tmp_path):
    utts = [f"{i}.wav" for i in range(30)]
    labels = ["bona-fide" if i < 15 else "spoof" for i in range(30)]
    key_rows = [f"a {u} c d e {lab} f g" for u, lab in zip(utts, labels)]
    key_file = tmp_path / "wild_keys.txt"
    _write_lines(str(key_file), key_rows)
    # 'bona-fide' literal must flow through _split_by_label
    score_file = _emit_scores(
        tmp_path, utts, ["bonafide" if l == "bona-fide" else l for l in labels], 4.0
    )
    res = score_in_the_wild(score_file, str(key_file))
    assert res.eer == 0.0


def test_scorer_cli(la_truth, tmp_path, capsys):
    truth, utts, labels = la_truth
    score_file = _emit_scores(tmp_path, utts, labels, separation=5.0)
    assert scorer_main(["LA", score_file, str(truth), "eval"]) == 0
    out = capsys.readouterr().out
    assert "min_tDCF:" in out and "eer: 0.00" in out
