"""Official ASVspoof 2021 scoring against organizer key files.

Library + CLI equivalents of the reference's three scorer scripts:
- 2021 LA: EER + min t-DCF with the fixed ASV operating point
  (reference: evaluate_2021_LA.py:18-119)
- 2021 DF: EER only (reference: evaluate_2021_DF.py:21-55)
- In-the-Wild: EER only, label literal 'bona-fide'
  (reference: evaluate_in_the_wild.py:33-39)

Key-file layout (organizer packages):
  <truth_dir>/LA/ASV/trial_metadata.txt        ASV keys (col 5 label, col 7 phase)
  <truth_dir>/LA/ASV/ASVTorch_Kaldi/score.txt  ASV scores (col 2)
  <truth_dir>/LA/CM/trial_metadata.txt         CM keys   (col 1 utt, col 5 label, col 7 phase)
  <truth_dir>/CM/trial_metadata.txt            DF CM keys
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import pandas as pd

from sls_tpu.metrics.eer import (
    DEFAULT_COST_MODEL,
    asv_error_rates,
    compute_eer,
    compute_tdcf,
)
from sls_tpu.scores.writer import read_score_file

PHASES = ("progress", "eval", "hidden_track")


@dataclass
class ScoreResult:
    eer: float  # fraction, not percent
    min_tdcf: Optional[float] = None
    inverted_is_better: bool = False

    def summary(self) -> str:
        out = ""
        if self.min_tdcf is not None:
            out += f"min_tDCF: {self.min_tdcf:.4f}\n"
        out += f"eer: {100 * self.eer:.2f}\n"
        return out


def _load_asv_operating_point(truth_dir: str, phase: str):
    """EER-threshold ASV error rates for the tandem DCF
    (reference: evaluate_2021_LA.py:34-50)."""
    asv_key = pd.read_csv(
        os.path.join(truth_dir, "LA/ASV/trial_metadata.txt"), sep=" ", header=None
    )
    asv_scr = pd.read_csv(
        os.path.join(truth_dir, "LA/ASV/ASVTorch_Kaldi/score.txt"),
        sep=" ",
        header=None,
    )
    in_phase = asv_key[7] == phase
    asv_scr = asv_scr[in_phase]
    key_phase = asv_key[in_phase]

    tar = asv_scr[2][key_phase[5] == "target"].to_numpy(dtype=np.float64)
    non = asv_scr[2][key_phase[5] == "nontarget"].to_numpy(dtype=np.float64)
    spoof = asv_scr[2][key_phase[5] == "spoof"].to_numpy(dtype=np.float64)

    _, threshold = compute_eer(tar, non)
    return asv_error_rates(tar, non, spoof, threshold)


def _merge_scores_with_keys(
    score_file: str, cm_key_file: str, phase: Optional[str]
) -> pd.DataFrame:
    """Merge submitted scores with organizer CM keys on utterance id."""
    cm_data = pd.read_csv(cm_key_file, sep=" ", header=None)
    utt_ids, scores = read_score_file(score_file)
    submission = pd.DataFrame({"utt_id": utt_ids, "score": scores})

    if len(submission) != len(cm_data):
        raise ValueError(
            f"submission has {len(submission)} of {len(cm_data)} expected trials"
        )
    keys = cm_data if phase is None else cm_data[cm_data[7] == phase]
    return submission.merge(keys, left_on="utt_id", right_on=1, how="inner")


def _split_by_label(merged: pd.DataFrame, bonafide_literal: str):
    bona = merged[merged[5] == bonafide_literal]["score"].to_numpy(np.float64)
    spoof = merged[merged[5] == "spoof"]["score"].to_numpy(np.float64)
    return bona, spoof


def score_2021_la(
    score_file: str,
    truth_dir: str,
    phase: str = "eval",
    cost_model: Optional[Dict[str, float]] = None,
) -> ScoreResult:
    """EER + min t-DCF for ASVspoof 2021 LA, with the official scorer's
    sign-inversion sanity check."""
    p_fa, p_miss, _, p_fa_spoof = _load_asv_operating_point(truth_dir, phase)
    merged = _merge_scores_with_keys(
        score_file, os.path.join(truth_dir, "LA/CM/trial_metadata.txt"), phase
    )
    bona, spoof = _split_by_label(merged, "bonafide")

    cm = DEFAULT_COST_MODEL if cost_model is None else cost_model
    eer = compute_eer(bona, spoof)[0]
    tdcf_curve, _ = compute_tdcf(bona, spoof, p_fa, p_miss, p_fa_spoof, cm)
    min_tdcf = float(np.min(tdcf_curve))

    inv_tdcf_curve, _ = compute_tdcf(-bona, -spoof, p_fa, p_miss, p_fa_spoof, cm)
    inverted_better = float(np.min(inv_tdcf_curve)) < min_tdcf

    return ScoreResult(eer=eer, min_tdcf=min_tdcf, inverted_is_better=inverted_better)


def score_2021_df(score_file: str, truth_dir: str, phase: str = "eval") -> ScoreResult:
    """EER-only scoring for ASVspoof 2021 DF."""
    merged = _merge_scores_with_keys(
        score_file, os.path.join(truth_dir, "CM/trial_metadata.txt"), phase
    )
    bona, spoof = _split_by_label(merged, "bonafide")
    return ScoreResult(eer=compute_eer(bona, spoof)[0])


def score_in_the_wild(score_file: str, key_file: str) -> ScoreResult:
    """EER-only scoring for In-the-Wild (no phase filter; 'bona-fide')."""
    merged = _merge_scores_with_keys(score_file, key_file, phase=None)
    bona, spoof = _split_by_label(merged, "bona-fide")
    return ScoreResult(eer=compute_eer(bona, spoof)[0])


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Official ASVspoof scoring")
    parser.add_argument("track", choices=["LA", "DF", "in-the-wild"])
    parser.add_argument("score_file")
    parser.add_argument("truth_dir", help="organizer keys dir (or key file for in-the-wild)")
    parser.add_argument("phase", nargs="?", default="eval", choices=PHASES)
    args = parser.parse_args(argv)

    if args.track == "LA":
        result = score_2021_la(args.score_file, args.truth_dir, args.phase)
    elif args.track == "DF":
        result = score_2021_df(args.score_file, args.truth_dir, args.phase)
    else:
        result = score_in_the_wild(args.score_file, args.truth_dir)

    print(result.summary(), end="")
    if result.inverted_is_better:
        print(
            "CHECK: negated scores achieve a lower min t-DCF — "
            "class labels were likely swapped during training"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
