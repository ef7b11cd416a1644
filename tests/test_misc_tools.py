"""Tests for inspect/compare analysis commands, score explainer, and the
results packager."""

import json

import numpy as np
import pytest

from sls_tpu.analysis.score_explainer import simulate_score_pipeline
from sls_tpu.cli.analyze import main as analyze_main
from sls_tpu.cli.package_results import package
from tests.test_cli_analysis import tiny_run  # fixture reuse


def test_inspect_command(tiny_run, tmp_path):
    run_dir, cfg = tiny_run
    out = tmp_path / "inspect.json"
    rc = analyze_main([
        "inspect", "--run_dir", run_dir, "--synthetic",
        "--output", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["config_weight_consistency"] is True
    assert report["inferred"]["dict_size"] == cfg.model.sae.dict_size
    assert report["inferred"]["uses_sparse_features"] is True
    assert report["forward"]["quality_score"] == 3


def test_compare_command(tiny_run, tmp_path):
    run_dir, _ = tiny_run
    out = tmp_path / "cmp.json"
    rc = analyze_main([
        "compare", "--run_dir", run_dir, "--compare_run_dir", run_dir,
        "--synthetic", "--num_samples", "8", "--batch_size", "8",
        "--output", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert "primary" in report and "secondary" in report
    # same checkpoint -> zero deltas
    assert all(abs(v) < 1e-9 for v in report["delta"].values())


def test_score_explainer():
    out = simulate_score_pipeline(seed=3)
    assert 0 <= out["score"] <= 1
    assert out["decision"] in ("bonafide", "spoof")
    assert out["frame_sparsity"] == pytest.approx(128 / 4096)
    # log-probs normalize
    assert np.exp(out["log_probs"]).sum() == pytest.approx(1.0, abs=1e-6)


def test_package_results(tiny_run, tmp_path):
    run_dir, _ = tiny_run
    dest = package(run_dir, tmp_path / "deliv")
    assert (dest / "SUMMARY.md").exists()
    assert (dest / "training_log.csv").exists()
    text = (dest / "SUMMARY.md").read_text()
    assert "best val EER" in text


def test_failure_and_global_cues_commands(tiny_run, tmp_path):
    run_dir, _ = tiny_run
    for command in ("failure", "global-cues"):
        out = tmp_path / f"{command}.json"
        rc = analyze_main([
            command, "--run_dir", run_dir, "--synthetic",
            "--num_samples", "12", "--batch_size", "6",
            "--output", str(out),
        ])
        assert rc == 0
        assert json.loads(out.read_text())
