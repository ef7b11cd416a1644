"""Fine batch sweep of the int8-ffn serving config (the b36 sweet spot
was found under pure bf16; the int8 path changes the layout mix)."""
import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")


def main() -> int:
    results = {}
    for b in [24, 27, 32, 36, 40, 45, 48, 54, 64, 72]:
        out = None
        try:
            out = subprocess.run(
                [sys.executable, BENCH, "--batch", str(b), "--iters", "16"],
                capture_output=True, text=True, timeout=900)
            j = json.loads(out.stdout.strip().splitlines()[-1])
            results[b] = j["value"]
            print(f"b{b}: {j['value']} utts/s", flush=True)
        except subprocess.TimeoutExpired:
            # one hung point (relay first-exec can exceed any bound)
            # must not lose the sweep's completed points
            print(f"b{b}: TIMEOUT >900s, skipped", flush=True)
        except Exception as exc:
            detail = out.stderr[-300:] if out is not None else repr(exc)
            print(f"b{b}: FAILED\n{detail}", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
