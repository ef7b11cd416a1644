"""Tests for the analysis CLI, monitor, autotrain helpers, and the
standalone 2019 scorer."""

import dataclasses
import json

import numpy as np
import pytest

from sls_tpu.cli.analyze import main as analyze_main
from sls_tpu.cli.monitor import read_log, render
from sls_tpu.cli.autotrain import last_epoch
from sls_tpu.config import (
    ExperimentConfig,
    RawBoostConfig,
    TrainConfig,
    config_from_dict,
    config_to_json,
)
from sls_tpu.scores.standalone import (
    main as standalone_main,
    roc_interp_eer,
    score_2019_protocol,
    simplified_min_dcf,
)
from sls_tpu.scores.writer import ScoreWriter
from tests.test_detector_train import WAV_LEN, synthetic_batch, tiny_model_config


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """Train a tiny model for 1 epoch so analysis has a real checkpoint."""
    from sls_tpu.data.pipeline import ArrayLoader
    from sls_tpu.train.loop import Trainer

    run_dir = tmp_path_factory.mktemp("analysis_run")
    cfg = ExperimentConfig(
        model=tiny_model_config(),
        train=TrainConfig(
            batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
        ),
    )
    rng = np.random.default_rng(0)
    wav, y = synthetic_batch(rng, 24)
    loader = ArrayLoader(np.asarray(wav), np.asarray(y), batch_size=8)
    trainer = Trainer(cfg, run_dir, tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    trainer.fit(loader, loader)
    return str(run_dir), cfg


def test_config_roundtrip(tiny_run):
    _, cfg = tiny_run
    restored = config_from_dict(
        ExperimentConfig, json.loads(config_to_json(cfg))
    )
    assert restored.model.sae.dict_size == cfg.model.sae.dict_size
    assert restored.model.encoder.conv_layers == cfg.model.encoder.conv_layers
    assert restored.train.lr == cfg.train.lr
    assert restored.model.sae.variant == cfg.model.sae.variant


@pytest.mark.parametrize(
    "command", ["temporal", "sparsity", "importance", "probe", "overlap"]
)
def test_analyze_commands_synthetic(tiny_run, tmp_path, command):
    run_dir, _ = tiny_run
    out = tmp_path / f"{command}.json"
    rc = analyze_main([
        command, "--run_dir", run_dir, "--synthetic",
        "--num_samples", "16", "--batch_size", "8",
        "--output", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report  # non-empty JSON


def test_analyze_attribution_with_ablation(tiny_run, tmp_path):
    run_dir, _ = tiny_run
    out = tmp_path / "attr.json"
    rc = analyze_main([
        "attribution", "--run_dir", run_dir, "--synthetic",
        "--num_samples", "8", "--batch_size", "8", "--top_k", "4",
        "--ablation", "--output", str(out),
        "--figures", str(tmp_path / "figs"),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert "cue_consistency" in report
    assert len(report["ablation"]["features"]) == 4
    assert (tmp_path / "figs" / "decision_relevance.png").exists()


@pytest.mark.parametrize("command,pngs", [
    ("temporal", ["temporal_stability.png"]),
    ("importance", ["feature_statistics.png"]),
    ("probe", ["acoustic_probe.png"]),
    ("failure", ["boundary_discontinuity_analysis.png",
                 "transient_vs_persistent.png"]),
])
def test_analyze_commands_emit_figures(tiny_run, tmp_path, command, pngs):
    """Figure parity (VERDICT r2 #6): each analysis command writes the
    reference script's PNG dashboard when --figures is given
    (reference: analyze_decision_relevance.py:886,
    visualize_transient_features.py, analyze_sae_neurons.py:245,
    boundary_discontinuity_analysis.png)."""
    run_dir, _ = tiny_run
    figs = tmp_path / "figs"
    out = tmp_path / f"{command}.json"
    rc = analyze_main([
        command, "--run_dir", run_dir, "--synthetic",
        "--num_samples", "16", "--batch_size", "8",
        "--output", str(out), "--figures", str(figs),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    for png in pngs:
        assert (figs / png).exists(), png
        assert (figs / png).stat().st_size > 1000
    assert sorted(report["figures"]) == sorted(
        str(figs / png) for png in pngs)


def test_monitor_render(tiny_run):
    run_dir, _ = tiny_run
    rows = read_log(run_dir)
    assert len(rows) == 1
    text = render(rows)
    assert "best val EER" in text
    assert last_epoch(run_dir) == 0
    assert last_epoch("/nonexistent") == -1


class TestStandaloneScorer:
    def test_roc_interp_eer_separable(self):
        eer, _ = roc_interp_eer(np.array([0.9, 0.8, 0.7]),
                                np.array([0.1, 0.2, 0.3]))
        assert eer == pytest.approx(0.0, abs=1e-6)

    def test_min_dcf_bounds(self):
        rng = np.random.default_rng(0)
        bona = rng.normal(1, 1, 200)
        spoof = rng.normal(-1, 1, 200)
        dcf = simplified_min_dcf(bona, spoof)
        assert 0 < dcf < 1
        perfect = simplified_min_dcf(bona + 100, spoof)
        assert perfect == pytest.approx(0.0)

    def test_score_2019_protocol(self, tmp_path, capsys):
        utts = [f"LA_E_{i:04d}" for i in range(30)]
        labels = ["bonafide" if i % 3 == 0 else "spoof" for i in range(30)]
        proto = tmp_path / "proto.txt"
        proto.write_text(
            "\n".join(f"spk {u} - - {l}" for u, l in zip(utts, labels)) + "\n"
        )
        rng = np.random.default_rng(1)
        score_file = tmp_path / "scores.txt"
        with ScoreWriter(score_file) as w:
            w.write_batch(
                utts,
                [(3 if l == "bonafide" else -3) + rng.normal(0, 0.1)
                 for l in labels],
            )
        res = score_2019_protocol(str(score_file), str(proto))
        assert res["n_trials"] == 30
        assert res["n_bonafide"] == 10
        assert res["eer"] == 0.0
        assert standalone_main([str(score_file), str(proto)]) == 0
        assert "EER: 0.0000%" in capsys.readouterr().out

    def test_score_2021_metadata(self, tmp_path, capsys):
        """2021 trial_metadata standalone mode
        (reference: compute_eer_2021LA.py:70-91)."""
        from sls_tpu.scores.standalone import score_2021_metadata

        utts = [f"LA_E_{i:04d}" for i in range(40)]
        labels = ["bonafide" if i % 2 == 0 else "spoof" for i in range(40)]
        meta = tmp_path / "trial_metadata.txt"
        rows = [
            f"spk {u} c d e {l} f {'eval' if i < 30 else 'progress'}"
            for i, (u, l) in enumerate(zip(utts, labels))
        ]
        meta.write_text("\n".join(rows) + "\n")
        rng = np.random.default_rng(2)
        score_file = tmp_path / "scores21.txt"
        with ScoreWriter(score_file) as w:
            w.write_batch(
                utts,
                [(3 if l == "bonafide" else -3) + rng.normal(0, 0.1)
                 for l in labels],
            )
        res = score_2021_metadata(str(score_file), str(meta))
        assert res["n_trials"] == 30  # phase filter drops the last 10
        assert res["n_bonafide"] == 15
        assert res["eer"] == 0.0
        assert standalone_main(
            [str(score_file), "--metadata", str(meta), "--phase", "eval"]
        ) == 0
        assert "EER: 0.0000%" in capsys.readouterr().out
        # exactly one of protocol / metadata must be given
        with pytest.raises(SystemExit):
            standalone_main([str(score_file)])


class TestAutotrainPolicy:
    """Failure discrimination: config errors fail fast, crashes retry
    only while the log advances (reference slurm semantics:
    train_window_topk.slurm:75-92 resubmits only after walltime kills,
    never on a misconfigured job)."""

    @staticmethod
    def _write_log(run_dir, epochs):
        run_dir.mkdir(parents=True, exist_ok=True)
        lines = ["epoch,val_eer"] + [f"{e},1.0" for e in range(epochs)]
        (run_dir / "training_log.csv").write_text("\n".join(lines) + "\n")

    def _run(self, monkeypatch, tmp_path, side_effect, **kw):
        from sls_tpu.cli import autotrain
        import subprocess as sp

        calls = []

        def fake_run(cmd, **_):
            calls.append(cmd)
            rc = side_effect(len(calls), tmp_path / "run")
            return sp.CompletedProcess(cmd, rc)

        monkeypatch.setattr(autotrain.subprocess, "run", fake_run)
        monkeypatch.setattr(autotrain.time, "sleep", lambda _: None)
        argv = ["--target_epoch", "3", "--run_dir", str(tmp_path / "run"),
                *[str(a) for pair in kw.items() for a in pair],
                "--", "--num_epochs", "4"]
        argv = [a.replace("max_no_progress", "--max_no_progress")
                for a in argv]
        rc = autotrain.main(argv)
        return rc, len(calls)

    def test_config_error_fails_fast(self, monkeypatch, tmp_path):
        rc, n = self._run(monkeypatch, tmp_path, lambda i, d: 2)
        assert rc == 2 and n == 1  # argparse error: no retry burn

    def test_no_progress_crashes_give_up(self, monkeypatch, tmp_path):
        rc, n = self._run(monkeypatch, tmp_path, lambda i, d: 1)
        assert rc == 1 and n == 3  # default max_no_progress

    def test_walltime_style_crashes_retry_to_target(
        self, monkeypatch, tmp_path
    ):
        def crash_but_progress(i, run_dir):
            self._write_log(run_dir, epochs=i + 1)  # advances every try
            return -9 if i < 3 else 0  # SIGKILL-style, then clean

        rc, n = self._run(monkeypatch, tmp_path, crash_but_progress)
        assert rc == 0 and n == 3  # epoch 3 logged on the 3rd attempt


@pytest.fixture(scope="module")
def tiny_sls_run(tmp_path_factory):
    """Train a tiny SLS model for 1 epoch (gates needs an SLS ckpt)."""
    from sls_tpu.data.pipeline import ArrayLoader
    from sls_tpu.models.sls import SLSTrainer

    run_dir = tmp_path_factory.mktemp("sls_analysis_run")
    cfg = ExperimentConfig(
        model=tiny_model_config(use_sae=False),
        train=TrainConfig(
            batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
        ),
    )
    rng = np.random.default_rng(1)
    wav, y = synthetic_batch(rng, 16)
    loader = ArrayLoader(np.asarray(wav), np.asarray(y), batch_size=8)
    trainer = SLSTrainer(cfg, run_dir, tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    trainer.fit(loader, loader)
    return str(run_dir)


def test_analyze_gates_sls(tiny_sls_run, tmp_path):
    """'gates' profiles the SLS layer gates from a run dir, per class,
    with the PNG dashboard."""
    from sls_tpu.cli.analyze import main as analyze_main

    out = tmp_path / "gates.json"
    figs = tmp_path / "figs"
    assert analyze_main([
        "gates", "--run_dir", tiny_sls_run, "--synthetic",
        "--num_samples", "8", "--batch_size", "4",
        "--output", str(out), "--figures", str(figs),
    ]) == 0
    report = json.loads(out.read_text())
    n_layers = len(report["mean_gate_per_layer"])
    assert n_layers >= 2  # tiny config: one gate per encoder layer
    assert all(0.0 <= g <= 1.0 for g in report["mean_gate_per_layer"])
    assert len(report["most_sensitive_layers"]) <= 5
    assert (figs / "layer_gates.png").exists()


def test_analyze_gates_rejects_detector_run(tiny_run, tmp_path):
    from sls_tpu.cli.analyze import main as analyze_main

    run_dir, _ = tiny_run
    with pytest.raises(SystemExit):
        analyze_main(["gates", "--run_dir", run_dir, "--synthetic"])


def test_analyze_sae_commands_reject_sls_run(tiny_sls_run):
    from sls_tpu.cli.analyze import main as analyze_main

    with pytest.raises(SystemExit):
        analyze_main(["sparsity", "--run_dir", tiny_sls_run,
                      "--synthetic"])
