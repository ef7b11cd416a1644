"""Standalone scorers: 2019-protocol EER and ROC-interpolation metrics.

Equivalents of the reference's self-contained scoring scripts:

- ``roc_interp_eer``: sklearn-ROC + brentq-interpolation EER
  (reference: compute_eer_2021LA.py:10-31)
- ``simplified_min_dcf``: single-system detection cost
  (reference: compute_eer_2021LA.py:33-66 — NOTE the reference
  implementation compares *labels* against the score threshold, a bug
  that makes its DCF constant; this version does the correct sweep over
  the DET curve and is documented as a deliberate fix)
- ``score_2019_protocol``: EER against a 5-column 2019 protocol
  (reference: compute_eer_2019.py:29-73 — which also double-multiplies
  EER by 100 when printing; fixed here, values are fractions)
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

from sls_tpu.data.protocols import parse_train_protocol
from sls_tpu.metrics.eer import compute_det_curve, compute_eer
from sls_tpu.scores.writer import read_score_file


def roc_interp_eer(
    bonafide_scores: np.ndarray, spoof_scores: np.ndarray
) -> Tuple[float, float]:
    """EER (fraction) + threshold via ROC interpolation + brentq root."""
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import roc_curve

    scores = np.concatenate([bonafide_scores, spoof_scores])
    labels = np.concatenate(
        [np.ones(len(bonafide_scores)), np.zeros(len(spoof_scores))]
    )
    fpr, tpr, thresholds = roc_curve(labels, scores, pos_label=1)
    eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
    threshold = float(interp1d(fpr, thresholds)(eer))
    return float(eer), threshold


def simplified_min_dcf(
    bonafide_scores: np.ndarray,
    spoof_scores: np.ndarray,
    p_target: float = 0.05,
    c_miss: float = 1.0,
    c_fa: float = 1.0,
) -> float:
    """min over thresholds of c_miss*P_miss*p_tgt + c_fa*P_fa*(1-p_tgt)."""
    frr, far, _ = compute_det_curve(
        np.asarray(bonafide_scores), np.asarray(spoof_scores)
    )
    dcf = c_miss * frr * p_target + c_fa * far * (1.0 - p_target)
    return float(np.min(dcf))


def score_2019_protocol(score_file: str, protocol_file: str) -> Dict[str, float]:
    """EER of a score file against a 2019-style 5-column protocol.

    Scores are matched to protocol rows BY UTTERANCE ID (the reference
    matched by line position, silently mis-scoring any reordering)."""
    utt_ids, scores = read_score_file(score_file)
    labels_map, _ = parse_train_protocol(protocol_file)

    matched = [(s, labels_map[u]) for u, s in zip(utt_ids, scores)
               if u in labels_map]
    if len(matched) != len(utt_ids):
        missing = len(utt_ids) - len(matched)
        raise ValueError(f"{missing} scored utterances missing from protocol")
    if len(matched) < len(labels_map):
        # a truncated score file (killed eval job leaves a usable
        # prefix) silently shrinking the trial set would yield a
        # quietly-wrong headline EER — same warning as the 2021 path
        import sys

        print(
            f"WARNING: only {len(matched)}/{len(labels_map)} protocol "
            f"trials have scores — EER below is computed on a PARTIAL "
            f"trial set",
            file=sys.stderr,
        )
    arr = np.asarray([s for s, _ in matched])
    lab = np.asarray([l for _, l in matched])
    bona, spoof = arr[lab == 1], arr[lab == 0]

    eer, threshold = compute_eer(bona, spoof)
    interp_eer, _ = roc_interp_eer(bona, spoof)
    return {
        "n_trials": len(arr),
        "n_bonafide": int((lab == 1).sum()),
        "n_spoof": int((lab == 0).sum()),
        "eer": eer,
        "eer_interp": interp_eer,
        "threshold": threshold,
        "min_dcf": simplified_min_dcf(bona, spoof),
    }


def score_2021_metadata(
    score_file: str, metadata_file: str, phase: str = "eval"
) -> Dict[str, float]:
    """EER/min-DCF of a score file against a 2021 ``trial_metadata.txt``.

    Reference: compute_eer_2021LA.py:70-91 — column 2 is the utt id,
    column 6 the bonafide/spoof label, column 8 the phase; only rows of
    the requested phase are scored.  Unlike the reference (which
    hardcodes a cluster metadata path), the key file is an argument.
    """
    utt_ids, scores = read_score_file(score_file)
    score_map = dict(zip(utt_ids, scores))
    bona, spoof = [], []
    n_keys = 0
    with open(metadata_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 8 and parts[7] == phase:
                n_keys += 1
                s = score_map.get(parts[1])
                if s is None:
                    continue
                (bona if parts[5] == "bonafide" else spoof).append(s)
    if not bona or not spoof:
        raise ValueError(
            f"no {'bonafide' if not bona else 'spoof'} trials matched "
            f"phase={phase!r} in {metadata_file}"
        )
    n_matched = len(bona) + len(spoof)
    if n_matched < n_keys:
        # a truncated score file (killed eval job) silently shrinking
        # the trial set would yield a quietly-wrong headline EER
        import sys

        print(
            f"WARNING: only {n_matched}/{n_keys} phase={phase!r} trials "
            f"have scores — EER below is computed on a PARTIAL trial set",
            file=sys.stderr,
        )
    bona_a, spoof_a = np.asarray(bona), np.asarray(spoof)
    eer, threshold = compute_eer(bona_a, spoof_a)
    interp_eer, _ = roc_interp_eer(bona_a, spoof_a)
    return {
        "n_trials": len(bona) + len(spoof),
        "n_keys_in_phase": n_keys,
        "n_bonafide": len(bona),
        "n_spoof": len(spoof),
        "eer": eer,
        "eer_interp": interp_eer,
        "threshold": threshold,
        "min_dcf": simplified_min_dcf(bona_a, spoof_a),
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="standalone EER scorer: 2019 protocol or 2021 "
        "trial-metadata key file"
    )
    parser.add_argument("score_file")
    parser.add_argument("protocol_file", nargs="?",
                        help="2019-style 5-column protocol")
    parser.add_argument("--metadata",
                        help="2021 trial_metadata.txt key file "
                        "(reference: compute_eer_2021LA.py)")
    parser.add_argument("--phase", default="eval",
                        choices=["progress", "eval", "hidden_track"])
    args = parser.parse_args(argv)
    if bool(args.protocol_file) == bool(args.metadata):
        parser.error("give exactly one of: protocol_file, --metadata")
    if args.metadata:
        res = score_2021_metadata(args.score_file, args.metadata, args.phase)
    else:
        res = score_2019_protocol(args.score_file, args.protocol_file)
    print(f"Total trials: {res['n_trials']}")
    print(f"Bonafide trials: {res['n_bonafide']}")
    print(f"Spoof trials: {res['n_spoof']}")
    print(f"EER: {100 * res['eer']:.4f}%")
    print(f"Threshold: {res['threshold']:.6f}")
    print(f"min DCF (simplified): {res['min_dcf']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
