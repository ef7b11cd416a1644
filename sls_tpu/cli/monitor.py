"""Training monitor — the shell monitors as a CLI.

Replaces monitor_job.sh / monitor_cpc_training.sh (reference: parses
training_log.csv into a live table + best-EER extraction,
monitor_cpc_training.sh:20-33):

    python -m sls_tpu.cli.monitor --run_dir models/<tag> [--watch 30]
"""

from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path


def read_log(run_dir: str):
    path = Path(run_dir) / "training_log.csv"
    if not path.exists():
        return []
    with open(path) as f:
        return list(csv.DictReader(f))


def render(rows, tail: int = 10) -> str:
    if not rows:
        return "no training_log.csv yet"
    cols = ["epoch", "train_loss", "train_eer", "val_loss", "val_eer",
            "val_acc", "epoch_seconds"]
    lines = ["  ".join(f"{c:>12}" for c in cols)]
    for row in rows[-tail:]:
        lines.append("  ".join(f"{row.get(c, ''):>12}" for c in cols))
    try:
        best = min(rows, key=lambda r: float(r["val_eer"]))
        lines.append(
            f"\nbest val EER: {float(best['val_eer']):.4f}% @ epoch "
            f"{best['epoch']}  ({len(rows)} epochs logged)"
        )
    except (KeyError, ValueError):
        pass
    return "\n".join(lines)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="training run monitor")
    parser.add_argument("--run_dir", required=True)
    parser.add_argument("--tail", type=int, default=10)
    parser.add_argument("--watch", type=int, default=0,
                        help="poll interval seconds (0 = print once)")
    args = parser.parse_args(argv)

    while True:
        print(render(read_log(args.run_dir), args.tail), flush=True)
        if not args.watch:
            return 0
        time.sleep(args.watch)
        print("\n" + "=" * 80 + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
