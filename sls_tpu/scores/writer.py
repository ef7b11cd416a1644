"""Score-file emission: the ``utt_id score`` contract.

The score file is the interface between the eval drivers and the official
scorers (reference: main.py:158-199 ``produce_evaluation_file``).  Lines are
``<utt_id> <float>`` where the float is P(bonafide) =
``exp(log_softmax)[:, 1]`` (higher = more bonafide), matching the
reference contract (main.py:183-185).  Callers with access to log-probs
should exponentiate in float64 (see Trainer.produce_scores) so confident
bonafide trials don't saturate to identical 1.0 float32 ties, which would
coarsen EER/t-DCF resolution.  Writes are flushed per batch so a killed
eval job leaves a usable prefix.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Sequence, Tuple, Union

import numpy as np

PathLike = Union[str, Path]


class ScoreWriter:
    """Incremental score-file writer with per-batch flush."""

    def __init__(self, path: PathLike, overwrite: bool = True):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if overwrite and self.path.exists():
            self.path.unlink()
        self._fh = open(self.path, "a")
        self.count = 0

    def write_batch(self, utt_ids: Sequence[str], scores: Iterable[float]) -> None:
        for utt_id, score in zip(utt_ids, scores):
            self._fh.write(f"{utt_id} {float(score)}\n")
            self.count += 1
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    def __enter__(self) -> "ScoreWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def read_score_file(path: PathLike) -> Tuple[List[str], np.ndarray]:
    """Read a score file back into (utt_ids, scores)."""
    utt_ids: List[str] = []
    scores: List[float] = []
    with open(path, "r") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            fields = line.split()
            if len(fields) != 2:
                raise ValueError(f"{path}: malformed score line: {line!r}")
            utt_ids.append(fields[0])
            scores.append(float(fields[1]))
    return utt_ids, np.asarray(scores, dtype=np.float64)
