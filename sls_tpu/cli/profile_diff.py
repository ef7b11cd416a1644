"""Op-level profile inspection / diff CLI.

The reference has no profiling at all (SURVEY.md §5.1); this wraps the
``train.profiling`` trace tooling into the two commands perf work
actually needs:

  # top device ops of one capture
  python -m sls_tpu.cli.profile_diff /tmp/prof_a

  # what did my change make slower?  (a = baseline, b = candidate)
  python -m sls_tpu.cli.profile_diff /tmp/prof_a /tmp/prof_b

Captures come from ``sls_tpu.train.profiling.trace(logdir)`` or
``--profile_steps`` in cli.main.  This workflow root-caused the SLS
head's +21 ms (docs/BENCH_NOTES_r4.json sls_head_root_cause).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("trace_a", help="jax.profiler logdir (baseline)")
    parser.add_argument("trace_b", nargs="?", default=None,
                        help="second logdir to diff against (candidate)")
    parser.add_argument("--lane", default=None,
                        help="substring the device lane's process name "
                        "must contain (default: TPU/device lanes)")
    parser.add_argument("--min_ms", type=float, default=0.05)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--json", action="store_true", dest="as_json")
    args = parser.parse_args(argv)

    from sls_tpu.train.profiling import compare_profiles, op_histogram

    a = op_histogram(args.trace_a, lane_filter=args.lane)
    if args.trace_b is None:
        rows = sorted(
            ({"op": k, "ms": round(v["ms"], 3), "count": v["count"]}
             for k, v in a.items() if v["ms"] >= args.min_ms),
            key=lambda r: -r["ms"])[: args.top]
        if args.as_json:
            print(json.dumps(rows))
        else:
            print(f"{'op':44s} {'ms':>10s} {'count':>7s}")
            for r in rows:
                print(f"{r['op'][:44]:44s} {r['ms']:10.3f} {r['count']:7d}")
        return 0

    b = op_histogram(args.trace_b, lane_filter=args.lane)
    rows = compare_profiles(a, b, min_ms=args.min_ms)[: args.top]
    if args.as_json:
        print(json.dumps(rows))
    else:
        print(f"{'op':44s} {'a_ms':>10s} {'b_ms':>10s} {'delta':>10s}")
        for r in rows:
            print(f"{r['op'][:44]:44s} {r['a_ms']:10.3f} "
                  f"{r['b_ms']:10.3f} {r['delta_ms']:10.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
