"""SLS model-type end-to-end via the CLI (train + eval on the synthetic
mini dataset)."""

import numpy as np
import pytest

from sls_tpu.cli.main import main
from sls_tpu.scores.writer import read_score_file
from tests.test_cli import _base_args, mini_dataset  # fixture reuse

pytestmark = pytest.mark.slow  # heavy integration tier


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


def test_2019la_track_and_full_utterance(mini_dataset, tmp_path):
    """2019-LA eval track + streamed full-utterance scoring path."""
    root = mini_dataset
    import wave as wave_mod
    import numpy as np
    from tests.test_cli import _write_wav

    # 2019-style eval: 5-column protocol + eval audio dir
    proto = root / "protocols" / "ASVspoof2019.LA.cm.eval.trl.txt"
    rng = np.random.default_rng(3)
    rows = []
    for i in range(6):
        utt = f"LA_E_{i:04d}"
        rows.append(f"SPK {utt} - A0{i % 3} {'bonafide' if i % 2 else 'spoof'}")
        # variable lengths exercise the windowed path
        _write_wav(root / "data" / "ASVspoof2019_LA_eval" / "flac" / f"{utt}.wav",
                   rng.normal(0, 0.05, 700 + 400 * i).astype(np.float32))
    proto.write_text("\n".join(rows) + "\n")

    run_root = tmp_path / "models"
    base = _base_args(root, run_root)
    assert main(base) == 0  # train 1 epoch

    out = tmp_path / "scores_2019.txt"
    assert main(base + ["--resume", "--is_eval", "--track", "2019LA",
                        "--eval_output", str(out)]) == 0
    ids, scores = read_score_file(out)
    assert len(ids) == 6

    out2 = tmp_path / "scores_2019_full.txt"
    assert main(base + ["--resume", "--is_eval", "--track", "2019LA",
                        "--full_utterance", "--eval_output", str(out2)]) == 0
    ids2, scores2 = read_score_file(out2)
    assert sorted(ids2) == sorted(ids)
    assert np.all((scores2 >= 0) & (scores2 <= 1))
