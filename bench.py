"""Throughput benchmark: 4-second-utterances/sec/chip on the flagship model.

Measures steady-state eval throughput of the full scoring path — XLS-R-300M
encoder (bf16, fp32 norm islands) + TopK SAE (dict 4096, k=128) + pooled
classifier — on one TPU chip, matching the BASELINE.json north-star metric
("4s-utterances/sec/chip (XLS-R-300M eval)").

``vs_baseline`` is measured against the reference single-GPU PyTorch
pipeline (fp32 eager, batch 20, librosa loader; main.py:158-199).  The
reference repo records no throughput numbers (BASELINE.md), and no GPU is
available here, so the baseline constant below is an estimate of XLS-R-300M
fp32 eager inference on an A100 (~126 GFLOP/utterance forward at the
10-15% FLOP utilization typical of eager fp32 torch on this workload):
BASELINE_UTTS_PER_SEC = 30.0.  Re-measure on real hardware when available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_UTTS_PER_SEC = 30.0  # documented estimate, see module docstring
BATCH = 64
WAV_LEN = 64600
WARMUP_ITERS = 3
TIMED_ITERS = 10


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sls_tpu.config import ModelConfig, SAEConfig, XLSRConfig
    from sls_tpu.models.detector import Detector

    cfg = ModelConfig(
        encoder=XLSRConfig(dtype=jnp.bfloat16),
        use_sae=True,
        use_sparse_features=True,
        sae=SAEConfig(activation_dim=1024, dict_size=4096, k=128),
    )
    model = Detector(cfg)

    rng = np.random.default_rng(0)
    wav_np = rng.normal(0, 0.1, size=(BATCH, WAV_LEN)).astype(np.float32)
    wav = jnp.asarray(wav_np)

    init_start = time.time()
    variables = model.init(jax.random.PRNGKey(0), wav[:1], train=False)
    params = variables["params"]
    print(f"# init {time.time() - init_start:.1f}s", file=sys.stderr)

    @jax.jit
    def forward(params, wav):
        return model.apply({"params": params}, wav, train=False)["score"]

    compile_start = time.time()
    forward(params, wav).block_until_ready()
    print(f"# compile+first-run {time.time() - compile_start:.1f}s", file=sys.stderr)

    for _ in range(WARMUP_ITERS):
        forward(params, wav).block_until_ready()

    start = time.time()
    for _ in range(TIMED_ITERS):
        score = forward(params, wav)
    score.block_until_ready()
    elapsed = time.time() - start

    utts_per_sec = BATCH * TIMED_ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "4s-utterances/sec/chip (XLS-R-300M eval)",
                "value": round(utts_per_sec, 2),
                "unit": "utterances/sec/chip",
                "vs_baseline": round(utts_per_sec / BASELINE_UTTS_PER_SEC, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
