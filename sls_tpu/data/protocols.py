"""ASVspoof protocol-file parsing.

Replaces the reference's ``genSpoof_list`` family
(reference: data_utils_SSL.py:13-53) with typed parsers for the three
protocol formats the pipeline consumes:

- 5-column train/dev protocols: ``speaker utt - - {bonafide|spoof}``
  (e.g. ASVspoof2019.LA.cm.train.trn.txt, 25,380 lines)
- one-utterance-per-line eval lists (ASVspoof2021.{LA,DF}.cm.eval.trl.txt)
- In-the-Wild eval lists where ids already carry ``.wav`` suffixes

Label convention (critical, easy to invert): **class 1 = bonafide,
class 0 = spoof** (reference: data_utils_SSL.py:38).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Tuple, Union

PathLike = Union[str, Path]

BONAFIDE_LABEL = 1
SPOOF_LABEL = 0


@dataclasses.dataclass(frozen=True)
class ProtocolEntry:
    """One row of a 5-column CM protocol file."""

    speaker: str
    utt_id: str
    system_id: str  # attack id, '-' for bonafide
    label: int  # 1 = bonafide, 0 = spoof


def parse_train_protocol(
    path: PathLike,
) -> Tuple[Dict[str, int], List[str]]:
    """Parse a 5-column train/dev protocol file.

    Returns ``(labels, utt_ids)`` where ``labels[utt] = 1`` for bonafide and
    ``0`` for spoof, preserving file order — the same contract as the
    reference's ``genSpoof_list(is_train=True)``.
    """
    labels: Dict[str, int] = {}
    utt_ids: List[str] = []
    with open(path, "r") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            fields = line.split()
            if len(fields) != 5:
                raise ValueError(
                    f"{path}: expected 5 columns, got {len(fields)}: {line!r}"
                )
            _, utt_id, _, _, label = fields
            utt_ids.append(utt_id)
            labels[utt_id] = _label_from_token(label, path, line)
    return labels, utt_ids


def _label_from_token(token: str, path, line: str) -> int:
    """Strict {bonafide, spoof} mapping.  Anything else (capitalized
    labels, 'genuine', a header row) must raise: silently mapping
    unknown tokens to spoof corrupts training labels with no error —
    the label convention is the 'critical, easy to invert' contract
    this module's docstring warns about."""
    if token == "bonafide":
        return BONAFIDE_LABEL
    if token == "spoof":
        return SPOOF_LABEL
    raise ValueError(
        f"{path}: unknown label token {token!r} (expected 'bonafide' or "
        f"'spoof') in line: {line!r}")


def parse_train_protocol_full(path: PathLike) -> List[ProtocolEntry]:
    """Parse a 5-column protocol keeping speaker/attack metadata.

    Used by the analysis suite for per-attack stratification
    (reference: probe_acoustic_asvspoof.py groups by attack type).
    """
    entries: List[ProtocolEntry] = []
    with open(path, "r") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            fields = line.split()
            if len(fields) != 5:
                raise ValueError(
                    f"{path}: expected 5 columns, got {len(fields)}: {line!r}"
                )
            spk, utt_id, _, system_id, label = fields
            entries.append(
                ProtocolEntry(
                    speaker=spk,
                    utt_id=utt_id,
                    system_id=system_id,
                    label=_label_from_token(label, path, line),
                )
            )
    return entries


def parse_eval_list(path: PathLike) -> List[str]:
    """Parse a one-utterance-id-per-line eval list.

    Works for ASVspoof 2021 LA/DF eval lists and for In-the-Wild lists
    (whose ids already include the ``.wav`` extension) — same contract as
    the reference's ``genSpoof_list(is_eval=True)``.
    """
    utt_ids: List[str] = []
    with open(path, "r") as f:
        for raw in f:
            line = raw.strip()
            if line:
                utt_ids.append(line)
    return utt_ids
