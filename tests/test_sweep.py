"""Sweep runner: reference preset matrix, grid parsing, exact run-dir
resolution, resumability (done points skipped), and a real 2-point
micro-sweep on the synthetic mini dataset."""

import json
from pathlib import Path

import pytest

from sls_tpu.cli.sweep import (
    REFERENCE_PRESET,
    main as sweep_main,
    parse_grid,
    point_args,
    resolve_run_dir,
)
from tests.test_cli import mini_dataset  # noqa: F401  (fixture reuse)


def test_reference_preset_matches_slurm_matrix():
    """The preset IS the reference's 8-job sweep (train_k32.slurm:48-62,
    train_k64/k128_sparse/k256/dict8192/window_topk/cpc.slurm)."""
    by_tag = {p["tag"]: p for p in REFERENCE_PRESET}
    assert {p["sae_k"] for p in REFERENCE_PRESET} == {32, 64, 128, 256}
    assert by_tag["dict8k_sparse"]["sae_dict_size"] == 8192
    assert by_tag["window_topk_w8"]["use_window_topk"]
    assert by_tag["window_topk_w8"]["sae_window_size"] == 8
    assert by_tag["cpc"]["use_cpc"] and by_tag["cpc"]["cpc_weight"] == 0.5


def test_parse_grid_cartesian():
    points = parse_grid(["k=32,64", "dict=4096,8192"])
    assert len(points) == 4
    assert {(p["sae_k"], p["sae_dict_size"]) for p in points} == {
        (32, 4096), (32, 8192), (64, 4096), (64, 8192)}
    assert all("tag" in p for p in points)
    assert len({p["tag"] for p in points}) == 4
    # window axis implies the window variant
    (p,) = parse_grid(["w=4"])
    assert p["use_window_topk"] and p["sae_window_size"] == 4


def test_point_args_roundtrip():
    args = point_args({"tag": "t", "sae_k": 32, "use_window_topk": True,
                       "lr": 1e-4})
    assert args[:2] == ["--comment", "t"]
    assert "--use_window_topk" in args
    assert args[args.index("--sae_k") + 1] == "32"


def test_resolve_run_dir_matches_cli_naming(tmp_path):
    """The sweep must predict cli.main's run dir EXACTLY (the run-tag
    idiom, reference main.py:473-476) or resumability silently breaks."""
    from sls_tpu.cli.main import build_parser, config_from_args

    point = {"tag": "k32_sparse_4096dim", "sae_k": 32,
             "sae_dict_size": 4096}
    forwarded = ["--num_epochs", "40"]
    run_dir = resolve_run_dir(point, forwarded, tmp_path)
    ns = build_parser().parse_args(
        ["--comment", "k32_sparse_4096dim", "--sae_k", "32",
         "--sae_dict_size", "4096", "--model_dir", str(tmp_path),
         "--num_epochs", "40"])
    assert run_dir == tmp_path / config_from_args(ns).model_tag()
    assert "k32" in run_dir.name and "_k32_sparse_4096dim" in run_dir.name


def test_dry_run_preset(tmp_path, capsys):
    rc = sweep_main([
        "--preset", "reference", "--model_dir", str(tmp_path),
        "--dry_run", "--", "--num_epochs", "40",
    ])
    assert rc == 1  # nothing done yet
    summary = json.loads((tmp_path / "sweep_summary.json").read_text())
    assert summary["n_points"] == len(REFERENCE_PRESET)
    assert all(s["state"] == "dry_run" for s in summary["points"].values())
    # every command goes through autotrain with the point's comment tag
    cmd = summary["points"]["k32_sparse_4096dim"]["cmd"]
    assert "sls_tpu.cli.autotrain" in cmd
    assert cmd[cmd.index("--comment") + 1] == "k32_sparse_4096dim"


@pytest.mark.slow
def test_micro_sweep_end_to_end(mini_dataset, tmp_path, monkeypatch):  # noqa: F811
    """A real 2-point sweep (tiny encoder, 1 epoch each) runs to done,
    writes per-point run dirs + summary, and skips done points on rerun."""
    # the sweep spawns cli.main subprocesses; pin them to the CPU
    # backend (cli.main._apply_platform_env) so the suite does not
    # hang or fail when the accelerator/relay is unavailable
    monkeypatch.setenv("SLS_TPU_PLATFORM", "cpu")
    model_dir = tmp_path / "models"
    argv = [
        "--grid", "k=8,16",
        "--model_dir", str(model_dir),
        "--target_epoch", "0",
        "--",
        "--tiny", "--audio_ext", "wav",
        "--database_path", str(mini_dataset / "data"),
        "--protocols_path", str(mini_dataset / "protocols"),
        "--batch_size", "8", "--num_epochs", "1", "--lr", "1e-3",
        "--sae_dict_size", "64", "--algo", "0",
    ]
    rc = sweep_main(argv)
    assert rc == 0
    summary = json.loads((model_dir / "sweep_summary.json").read_text())
    assert summary["n_done"] == 2
    for tag, s in summary["points"].items():
        assert s["state"] == "done", (tag, s)
        assert Path(s["run_dir"]).joinpath("training_log.csv").exists()
        assert s["best_val_eer"] is not None

    # rerun: both points detected done, nothing retrained
    rc2 = sweep_main(argv)
    assert rc2 == 0
    summary2 = json.loads((model_dir / "sweep_summary.json").read_text())
    assert all("exit_code" not in s for s in summary2["points"].values())
