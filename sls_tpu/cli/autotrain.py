"""Crash-resilient training runner — the SLURM auto-resubmit loop as code.

Replaces the reference's walltime-kill survival machinery
(reference: train_window_topk.slurm:75-92 parses training_log.csv's last
epoch and re-sbatches itself until the target epoch;
train_auto_resume.slurm generalizes it):

    python -m sls_tpu.cli.autotrain --target_epoch 39 -- <cli.main args...>

Runs ``sls_tpu.cli.main`` in a subprocess with --resume, restarting on
crash-style exits until the CSV log reaches the target epoch or the
retry budget is exhausted.  Works under any scheduler (or none).

Failure discrimination (the reference slurm loop only resubmits after a
walltime kill, never on a misconfigured job): argparse/config errors
(exit code 2, argparse's convention) fail FAST instead of burning the
restart budget; other non-zero exits retry, but only
``--max_no_progress`` consecutive times without the log advancing — a
run that crashes repeatedly before completing a single new epoch is a
broken config, not a walltime kill.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

from sls_tpu.cli.monitor import read_log


def last_epoch(run_dir: str) -> int:
    rows = read_log(run_dir)
    try:
        return int(rows[-1]["epoch"]) if rows else -1
    except (KeyError, ValueError):
        return -1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="auto-resuming trainer")
    parser.add_argument("--target_epoch", type=int, required=True)
    parser.add_argument("--run_dir", required=True,
                        help="run directory (model_dir/model_tag)")
    parser.add_argument("--max_restarts", type=int, default=20)
    parser.add_argument("--max_no_progress", type=int, default=3,
                        help="consecutive failed attempts tolerated "
                             "without the CSV log advancing an epoch")
    parser.add_argument("--restart_delay", type=float, default=5.0)
    parser.add_argument("train_args", nargs=argparse.REMAINDER,
                        help="arguments forwarded to sls_tpu.cli.main "
                             "(prefix with --)")
    args = parser.parse_args(argv)

    forwarded = [a for a in args.train_args if a != "--"]
    restarts = 0
    no_progress = 0
    while True:
        done = last_epoch(args.run_dir)
        if done >= args.target_epoch:
            print(f"target epoch {args.target_epoch} reached (last={done})")
            return 0
        if restarts > args.max_restarts:
            print(f"giving up after {restarts} restarts (last epoch {done})")
            return 1

        cmd = [sys.executable, "-m", "sls_tpu.cli.main", *forwarded]
        if done >= 0 and "--resume" not in cmd:
            cmd.append("--resume")
        print(f"[autotrain] attempt {restarts}: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd)
        now = last_epoch(args.run_dir)
        if proc.returncode == 0 and now >= args.target_epoch:
            return 0
        if proc.returncode == 2:
            # argparse convention: bad flags / config error — retrying
            # re-runs the identical broken command; fail fast instead
            print("[autotrain] exit code 2 (usage/config error) — "
                  "not retrying", flush=True)
            return 2
        if now > done:
            no_progress = 0  # real progress: crash/walltime-style, retry
        else:
            no_progress += 1
            if no_progress >= args.max_no_progress:
                print(f"[autotrain] {no_progress} consecutive failures "
                      f"with no epoch progress (stuck at {now}) — "
                      "giving up; fix the config and rerun", flush=True)
                return 1
        restarts += 1
        time.sleep(args.restart_delay)


if __name__ == "__main__":
    raise SystemExit(main())
