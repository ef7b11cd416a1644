"""Training-throughput benchmark for the SLS model family.

Companion to bench_train.py (flagship) — measures the jitted SLS train
step (forward + backward + Adam + batch_stats update) in BOTH of the
family's production modes:

  frozen   — BASELINE config #1, "XLS-R-300M frozen + SLS head"
             (reference README.md:84-86's published model trains this
             way): encoder forward only, backward touches the head
  finetune — full fine-tune incl. the SSL encoder

Steps chain through the donated train state; timing N dispatches and
fetching only the final loss measures the pipelined device rate
(bench.py methodology — device_get is the only reliable sync on the
axon relay).  Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import time


def run_config(batch: int, freeze: bool, iters: int = 8) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sls_tpu.config import (
        ExperimentConfig, ModelConfig, TrainConfig, XLSRConfig,
    )
    from sls_tpu.models.sls import (
        SLSDetector, create_sls_train_state, make_sls_train_step,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            encoder=XLSRConfig(dtype=jnp.bfloat16),
            use_sae=False,
            freeze_encoder=freeze,
        ),
        train=TrainConfig(batch_size=batch, lr=1e-6),
    )
    model = SLSDetector(cfg.model)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.1, (batch, 64600)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, batch))
    valid = jnp.ones((batch,), bool)

    key = jax.random.PRNGKey(0)
    state = create_sls_train_state(model, cfg, key, wav[:2])
    step = make_sls_train_step(model, cfg, mesh=None)

    state, metrics = step(state, wav, labels, valid, key)  # compile
    jax.device_get(metrics["loss"])
    start = time.time()
    for _ in range(iters):
        state, metrics = step(state, wav, labels, valid, key)
    final = float(jax.device_get(metrics["loss"]))
    elapsed = time.time() - start
    assert np.isfinite(final), "non-finite training loss"
    return batch * iters / elapsed


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+", default=[36])
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--modes", type=str, nargs="+",
                        default=["frozen", "finetune"],
                        choices=["frozen", "finetune"])
    args = parser.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    for batch in args.batches:
        for mode in args.modes:
            ups = run_config(batch, freeze=(mode == "frozen"),
                             iters=args.iters)
            print(json.dumps({
                "metric": f"train utts/sec/chip (XLS-R + SLS, {mode})",
                "value": round(ups, 2),
                "unit": "utterances/sec/chip",
                "batch": batch,
                "mode": mode,
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
