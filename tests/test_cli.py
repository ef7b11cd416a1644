"""End-to-end CLI test on a synthetic miniature dataset (WAV audio,
tiny encoder) — train 1 epoch, resume, then eval-mode score production."""

import wave
from pathlib import Path

import numpy as np
import pytest

from sls_tpu.cli.main import build_parser, config_from_args, main
from sls_tpu.scores.writer import read_score_file


def _write_wav(path: Path, samples: np.ndarray):
    path.parent.mkdir(parents=True, exist_ok=True)
    pcm = np.clip(samples * 32767, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini")
    db = root / "data"
    proto = root / "protocols"
    proto.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(800) / 16000.0
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)

    def make_split(split_dir, protocol_path, n, prefix):
        rows = []
        for i in range(n):
            label = "bonafide" if i % 2 == 0 else "spoof"
            utt = f"{prefix}_{i:04d}"
            wav = rng.normal(0, 0.05, 800).astype(np.float32)
            if label == "bonafide":
                wav += 0.3 * tone
            _write_wav(db / split_dir / "flac" / f"{utt}.wav", wav)
            rows.append(f"SPK_{i % 3} {utt} - - {label}")
        protocol_path.write_text("\n".join(rows) + "\n")

    make_split("ASVspoof2019_LA_train", proto / "ASVspoof2019.LA.cm.train.trn.txt",
               16, "T")
    make_split("ASVspoof2019_LA_dev", proto / "ASVspoof2019.LA.cm.dev.trl.txt",
               8, "D")

    # eval list + audio (2021-LA layout)
    eval_ids = [f"E_{i:04d}" for i in range(10)]
    (proto / "ASVspoof2021.LA.cm.eval.trl.txt").write_text(
        "\n".join(eval_ids) + "\n"
    )
    for utt in eval_ids:
        _write_wav(db / "ASVspoof2021_LA_eval" / "flac" / f"{utt}.wav",
                   rng.normal(0, 0.05, 800).astype(np.float32))
    return root


def _base_args(root, run_root):
    return [
        "--tiny", "--audio_ext", "wav",
        "--database_path", str(root / "data"),
        "--protocols_path", str(root / "protocols"),
        "--model_dir", str(run_root),
        "--batch_size", "8", "--num_epochs", "1", "--lr", "1e-3",
        "--sae_dict_size", "256", "--sae_k", "32",
        "--algo", "0",  # no --cp_path: random tiny encoder (an explicit
        # nonexistent path is now a hard error — see test below)
    ]


def test_explicit_missing_cp_path_is_an_error(tmp_path):
    from sls_tpu.cli.main import main

    assert main(["--tiny", "--model_dir", str(tmp_path),
                 "--cp_path", "/nonexistent.pt"]) == 2


def test_seq_parallel_requires_unwindowed_eval():
    """--seq_parallel only applies to un-windowed full-utterance eval;
    anything else must fail loud, not silently score single-device."""
    from sls_tpu.cli.main import main

    assert main(["--tiny", "--seq_parallel", "2"]) == 2
    assert main(["--tiny", "--is_eval", "--seq_parallel", "2"]) == 2
    assert main(["--tiny", "--is_eval", "--full_utterance",
                 "--seq_parallel", "2"]) == 2
    # --unwindowed outside full-utterance eval: same fail-loud policy
    assert main(["--tiny", "--unwindowed"]) == 2
    assert main(["--tiny", "--is_eval", "--unwindowed"]) == 2


def test_config_from_args_variants():
    parser = build_parser()
    cfg = config_from_args(parser.parse_args(["--use_window_topk",
                                              "--overlap_windows"]))
    assert cfg.model.sae.variant == "window_overlap"
    cfg = config_from_args(parser.parse_args(["--use_cpc"]))
    assert cfg.model.sae.variant == "window_hard"
    assert cfg.model.use_cpc
    cfg = config_from_args(parser.parse_args([]))
    assert cfg.model.sae.variant == "per_timestep"
    assert cfg.model.sae.dict_size == 4096 and cfg.model.sae.k == 128
    assert "topk_sae_pt_LA" in cfg.model_tag()


def test_mutually_exclusive_resume_flags():
    assert main(["--resume", "--fresh_start"]) == 2


@pytest.fixture(scope="module")
def trained_run(mini_dataset, tmp_path_factory):
    run_root = tmp_path_factory.mktemp("models")
    rc = main(_base_args(mini_dataset, run_root))
    assert rc == 0
    return run_root


def test_train_writes_run_dir(trained_run):
    run_dirs = list(Path(trained_run).iterdir())
    assert len(run_dirs) == 1
    d = run_dirs[0]
    assert (d / "training_log.csv").exists()
    assert (d / "last.ckpt").exists()


def test_resume_then_eval(mini_dataset, trained_run, tmp_path):
    out = tmp_path / "scores_LA.txt"
    rc = main(_base_args(mini_dataset, trained_run)
              + ["--resume", "--is_eval", "--eval_output", str(out)])
    assert rc == 0
    ids, scores = read_score_file(out)
    assert len(ids) == 10
    assert ids[0] == "E_0000"
    assert np.all((scores >= 0) & (scores <= 1))
