"""Sweep runner — the reference's k/dict/window SLURM sweep as one command.

The reference ships 8 near-identical sweep jobs (train_k32.slurm:48-62,
train_k64.slurm, train_k128_sparse.slurm, train_k256.slurm,
train_dict8192.slurm, train_window_topk.slurm, train_cpc.slurm,
train_asvspoof_df.slurm), each = fixed hyperparameters + a comment tag
+ resume-if-checkpoint-exists; the last is a hyperparameter-duplicate
of train_k128_sparse.slurm (LA track, k128/dict4096 — only the tag
differs), so the preset has 7 distinct points.  This runner drives the
same matrix sequentially and resumably:

    python -m sls_tpu.cli.sweep --preset reference -- \\
        --database_path ... --num_epochs 40

    python -m sls_tpu.cli.sweep --grid k=32,64,128,256 dict=4096,8192 -- \\
        --num_epochs 40 ...

Each sweep point runs ``sls_tpu.cli.main`` (via cli.autotrain for crash
resilience) with `--comment <tag>` so every point gets its own run dir
(the run-name-as-config idiom, reference main.py:473-476).  Completed
points (CSV log at the target epoch) are skipped, so the sweep itself
is resumable; a failed point is recorded and the sweep continues.
Writes <sweep_dir>/sweep_summary.json with per-point status + best
val EER.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path
from typing import Dict, List, Optional

from sls_tpu.cli.monitor import read_log

# the reference's 8 training sweep jobs as 7 DISTINCT configurations
# (train_k*.slurm, train_dict8192.slurm, train_window_topk.slurm,
# train_cpc.slurm; all: bs 14, lr 1e-6, wd 1e-4, 40 epochs, LA track).
# The 8th job, train_asvspoof_df.slurm, is hyperparameter-identical to
# train_k128_sparse.slurm — despite its name it trains --track=LA with
# k=128/dict=4096 (train_asvspoof_df.slurm:48-62) and differs only in
# --comment (run-dir tag), so it is deliberately not duplicated here.
REFERENCE_PRESET = [
    {"tag": "k32_sparse_4096dim", "sae_k": 32, "sae_dict_size": 4096},
    {"tag": "k64_sparse", "sae_k": 64, "sae_dict_size": 4096},
    {"tag": "k128_sparse_4096dim", "sae_k": 128, "sae_dict_size": 4096},
    {"tag": "k256_sparse", "sae_k": 256, "sae_dict_size": 4096},
    {"tag": "dict8k_sparse", "sae_k": 128, "sae_dict_size": 8192},
    {"tag": "window_topk_w8", "sae_k": 128, "sae_dict_size": 4096,
     "use_window_topk": True, "sae_window_size": 8},
    {"tag": "cpc", "sae_k": 128, "sae_dict_size": 4096,
     "use_cpc": True, "sae_window_size": 8, "cpc_weight": 0.5},
]


def parse_grid(specs: List[str]) -> List[Dict]:
    """``k=32,64 dict=4096,8192 w=8`` -> cartesian product of points."""
    import itertools

    names = {"k": "sae_k", "dict": "sae_dict_size", "w": "sae_window_size",
             "lr": "lr", "bs": "batch_size", "sae_weight": "sae_weight"}
    axes = []
    for spec in specs:
        name, _, vals = spec.partition("=")
        if not vals:
            raise SystemExit(f"bad grid spec: {spec!r} (want name=v1,v2)")
        key = names.get(name, name)
        parsed = [float(v) if "." in v or "e" in v.lower() else int(v)
                  for v in vals.split(",")]
        axes.append([(key, v) for v in parsed])
    points = []
    for combo in itertools.product(*axes):
        point = dict(combo)
        if "sae_window_size" in point:
            point["use_window_topk"] = True
        point["tag"] = "_".join(
            f"{k.replace('sae_', '').replace('dict_size', 'dict')}{v}"
            for k, v in combo
        )
        points.append(point)
    return points


def point_args(point: Dict) -> List[str]:
    """Sweep point -> cli.main flags."""
    args = ["--comment", point["tag"]]
    for key, value in point.items():
        if key == "tag":
            continue
        if isinstance(value, bool):
            if value:
                args.append(f"--{key}")
        else:
            args.extend([f"--{key}", str(value)])
    return args


def resolve_run_dir(point: Dict, forwarded: List[str],
                    model_dir: Path) -> Path:
    """EXACT run dir for a sweep point: parse the final flag set through
    cli.main's own parser + config builder and apply the run-tag idiom
    (reference: main.py:473-476) — no name guessing."""
    from sls_tpu.cli.main import build_parser, config_from_args

    ns = build_parser().parse_args(
        [*point_args(point), "--model_dir", str(model_dir), *forwarded]
    )
    return model_dir / config_from_args(ns).model_tag()


def point_status(run_dir: Path, target_epoch: int) -> Dict:
    rows = read_log(str(run_dir))
    if not rows:
        return {"state": "pending", "run_dir": str(run_dir)}
    last = int(rows[-1]["epoch"])
    best = min(
        (float(r["val_eer"]) for r in rows if r.get("val_eer")),
        default=None,
    )
    return {
        "state": "done" if last >= target_epoch else "partial",
        "run_dir": str(run_dir),
        "last_epoch": last,
        "best_val_eer": best,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="hyperparameter sweep runner")
    sel = p.add_mutually_exclusive_group(required=True)
    sel.add_argument("--preset", choices=["reference"],
                     help="the reference's k/dict/window/cpc sweep "
                          "matrix (8 jobs, 7 distinct configs — see "
                          "REFERENCE_PRESET)")
    sel.add_argument("--grid", nargs="+",
                     help="axes like k=32,64,128 dict=4096,8192")
    p.add_argument("--model_dir", default="models")
    p.add_argument("--target_epoch", type=int, default=39,
                   help="epoch at which a point counts as done "
                        "(reference auto-resubmit target)")
    p.add_argument("--max_restarts", type=int, default=5,
                   help="per-point crash-restart budget (autotrain)")
    p.add_argument("--dry_run", action="store_true",
                   help="print the commands without running")
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="flags forwarded to every cli.main run "
                        "(prefix with --)")
    args = p.parse_args(argv)

    points = (REFERENCE_PRESET if args.preset == "reference"
              else parse_grid(args.grid))
    forwarded = [a for a in args.train_args if a != "--"]
    model_dir = Path(args.model_dir)
    summary = {"points": {}}

    for point in points:
        tag = point["tag"]
        run_dir = resolve_run_dir(point, forwarded, model_dir)
        status = point_status(run_dir, args.target_epoch)
        if status["state"] == "done":
            print(f"[sweep] {tag}: already done "
                  f"(best val EER {status['best_val_eer']})", flush=True)
            summary["points"][tag] = status
            continue

        cmd = [
            sys.executable, "-m", "sls_tpu.cli.autotrain",
            "--target_epoch", str(args.target_epoch),
            "--run_dir", str(run_dir),
            "--max_restarts", str(args.max_restarts),
            "--",
            *point_args(point),
            "--model_dir", str(model_dir),
            *forwarded,
        ]
        print(f"[sweep] {tag}: {' '.join(cmd)}", flush=True)
        if args.dry_run:
            summary["points"][tag] = {"state": "dry_run", "cmd": cmd,
                                      "run_dir": str(run_dir)}
            continue

        rc = subprocess.run(cmd).returncode
        final = point_status(run_dir, args.target_epoch)
        final["exit_code"] = rc
        summary["points"][tag] = final
        if rc == 2:
            print(f"[sweep] {tag}: config error — aborting the sweep "
                  "(the same flags would break every point)", flush=True)
            break

    done = sum(1 for s in summary["points"].values()
               if s.get("state") == "done")
    summary["n_done"] = done
    summary["n_points"] = len(points)
    model_dir.mkdir(parents=True, exist_ok=True)
    out = model_dir / "sweep_summary.json"
    out.write_text(json.dumps(summary, indent=2))
    print(f"[sweep] {done}/{len(points)} done -> {out}", flush=True)
    return 0 if done == len(points) else 1


if __name__ == "__main__":
    raise SystemExit(main())
