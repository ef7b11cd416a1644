from sls_tpu.scores.writer import ScoreWriter, read_score_file
from sls_tpu.scores.evaluate import (
    score_2021_df,
    score_2021_la,
    score_in_the_wild,
)

__all__ = [
    "ScoreWriter",
    "read_score_file",
    "score_2021_df",
    "score_2021_la",
    "score_in_the_wild",
]
