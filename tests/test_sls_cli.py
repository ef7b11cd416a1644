"""SLS model-type end-to-end via the CLI (train + eval on the synthetic
mini dataset)."""

import numpy as np
import pytest

from sls_tpu.cli.main import main
from sls_tpu.scores.writer import read_score_file
from tests.test_cli import _base_args, mini_dataset  # fixture reuse


def test_sls_cli_train_and_eval(mini_dataset, tmp_path):
    run_root = tmp_path / "models"
    args = _base_args(mini_dataset, run_root) + ["--model_type", "sls"]
    assert main(args) == 0

    run_dirs = list(run_root.iterdir())
    assert len(run_dirs) == 1
    assert run_dirs[0].name.startswith("sls_LA")
    assert (run_dirs[0] / "last.ckpt").exists()

    out = tmp_path / "scores.txt"
    assert main(args + ["--resume", "--is_eval",
                        "--eval_output", str(out)]) == 0
    ids, scores = read_score_file(out)
    assert len(ids) == 10
    assert np.all((scores >= 0) & (scores <= 1))
