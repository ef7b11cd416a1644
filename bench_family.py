"""Family bench matrix: one command, every model variant, current code.

VERDICT r4 #1: the headline series covered only the per-timestep
flagship; window-overlap/hard numbers dated from round 1 and the CPC
train step (reference model_cpc.py:473-528 — the one cross-device
contraction SURVEY §7 flags) had never been measured.  This driver runs
each family member's bench in its own subprocess (clean HBM between
configs, shared /tmp/jax_cache so warm reruns are fast) and prints one
JSON line per row plus a final ``family_matrix`` summary line.

Rows (all on the real chip):

  eval:  per_timestep | window_overlap | window_hard   (bench.py --variant)
         sls                                           (bench_sls.py)
  train: fine_tune (b112) | frozen (b64) | cpc (b64)   (bench_train.py)
         sls fine_tune+frozen (b36)                    (bench_sls_train.py)

Use ``--rows`` to run a subset, e.g. ``--rows eval_window_overlap
train_cpc``.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

ROWS = {
    "eval_per_timestep": [sys.executable, "bench.py"],
    "eval_window_overlap": [sys.executable, "bench.py",
                            "--variant", "window_overlap"],
    "eval_window_hard": [sys.executable, "bench.py",
                         "--variant", "window_hard"],
    "eval_sls": [sys.executable, "bench_sls.py"],
    # batches: each mode's measured-best from its own sweep
    # (fine-tune b112, frozen b64: BENCH_NOTES_r4; cpc starts at the
    # frozen-adjacent b64 — same memory class as fine-tune + a small head)
    "train_fine_tune": [sys.executable, "bench_train.py",
                        "--batches", "112"],
    "train_frozen": [sys.executable, "bench_train.py", "--freeze",
                     "--batches", "64"],
    "train_cpc": [sys.executable, "bench_train.py", "--use_cpc",
                  "--batches", "64"],
    "train_window_overlap": [sys.executable, "bench_train.py",
                             "--variant", "window_overlap",
                             "--batches", "64"],
    "train_window_hard": [sys.executable, "bench_train.py",
                          "--variant", "window_hard", "--batches", "64"],
    "train_sls": [sys.executable, "bench_sls_train.py"],
}


def run_row(name: str, cmd: list, timeout: float) -> dict:
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"row": name, "error": f"timeout after {timeout:.0f}s"}
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if not rows:
        return {"row": name, "error":
                (proc.stderr.strip()[-300:] or f"rc={proc.returncode}")}
    out = rows[0] if len(rows) == 1 else {"rows": rows}
    out["row"] = name
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", nargs="+", default=list(ROWS),
                        choices=list(ROWS))
    parser.add_argument("--timeout", type=float, default=1800.0,
                        help="per-row subprocess timeout (cold compiles "
                        "of a new variant can take minutes)")
    args = parser.parse_args(argv)

    results = []
    for name in args.rows:
        res = run_row(name, ROWS[name], args.timeout)
        print(json.dumps(res), flush=True)
        results.append(res)

    ok = [r for r in results if "error" not in r]
    print(json.dumps({
        "metric": "family_matrix rows ok",
        "value": len(ok),
        "unit": "rows",
        "vs_baseline": len(ok) / max(len(results), 1),
        "rows_run": args.rows,
    }), flush=True)
    return 0 if len(ok) == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
