"""Export a trained run dir as a self-contained deployment artifact.

    python -m sls_tpu.cli.export models/<tag> --out artifacts/<tag> \
        [--batch 36] [--wire int16] [--int8] [--platforms tpu,cpu] \
        [--verify]

The artifact (serialized StableHLO + params + manifest — see
serve/export.py) reloads on a host that has jax but NOT this package's
model code, and plugs straight into the serving engine:

    python -m sls_tpu.cli.serve --from_export artifacts/<tag>

``--verify`` reloads the artifact immediately and diffs it against the
live (jit-from-source) scorer on random audio; any drift above 1e-3
log-prob is a failure.  Beyond-reference capability: the reference
deploys by copying ``.pth`` files plus matching ``model_*.py`` source
(reference: main.py:753-764).
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("run_dir", help="trained run directory")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--checkpoint", default=None,
                   help="explicit checkpoint path (default: last > best)")
    p.add_argument("--batch", type=int, default=36,
                   help="fixed serving batch baked into the program "
                        "(36 = measured flagship sweet spot, bench.py)")
    p.add_argument("--wire", choices=("float32", "int16", "mulaw"),
                   default="float32",
                   help="on-wire audio dtype baked into the program")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. "
                        "'tpu,cpu' (default: current backend only)")
    p.add_argument("--verify", action="store_true",
                   help="reload the artifact and diff vs the live scorer")
    int8 = p.add_mutually_exclusive_group()
    int8.add_argument("--int8", dest="int8", action="store_true",
                      default=None, help="force int8 serving GEMMs on")
    int8.add_argument("--no_int8", dest="int8", action="store_false",
                      help="force the exact bf16 path")
    return p


def main(argv=None) -> int:
    from sls_tpu.cli.main import _apply_platform_env

    _apply_platform_env()
    args = build_parser().parse_args(argv)

    from sls_tpu.serve.export import export_serving

    platforms = args.platforms.split(",") if args.platforms else None
    manifest = export_serving(
        args.run_dir, args.out,
        batch_size=args.batch, wire_dtype=args.wire, int8=args.int8,
        checkpoint=args.checkpoint, platforms=platforms,
    )
    print(json.dumps({k: v for k, v in manifest.items() if k != "config"},
                     indent=1))

    if args.verify:
        import numpy as np

        from sls_tpu.data.pipeline import to_wire
        from sls_tpu.serve.export import load_exported
        from sls_tpu.serve.scorer import load_serving_model

        manifest, exported_fwd = load_exported(args.out)
        _, live_fwd = load_serving_model(
            args.run_dir, args.checkpoint, int8=args.int8)
        rng = np.random.default_rng(0)
        wav = rng.normal(
            0, 0.1, size=(manifest["batch_size"], manifest["cut"]),
        ).astype(np.float32)
        wire = to_wire(wav, manifest["wire_dtype"])
        diff = float(np.max(np.abs(
            np.asarray(exported_fwd(wire), np.float64)
            - np.asarray(live_fwd(wire), np.float64))))
        print(json.dumps({"verify_max_abs_diff": diff}))
        if diff > 1e-3:
            print("ERROR: exported program drifts from the live scorer")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
