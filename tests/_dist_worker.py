"""Worker process for tests/test_distributed.py.

Runs one of two cooperating processes (4 virtual CPU devices each →
one 8-device global mesh) through the real multi-host code paths:
``distributed.initialize``, ``global_batch`` train steps over the global
mesh, host-local validation, primary-gated checkpoint/CSV IO, and
part-file score merging.  Prints one JSON line of metrics for the parent
test to compare across hosts.

Usage: python tests/_dist_worker.py <port> <process_id> <run_dir>
"""

import json
import sys


def main() -> int:
    port, pid, run_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from sls_tpu.parallel import distributed as dist

    assert dist.initialize(f"localhost:{port}", 2, pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    assert dist.is_primary() == (pid == 0)

    import dataclasses

    import numpy as np

    from sls_tpu.config import ExperimentConfig, RawBoostConfig, TrainConfig
    from sls_tpu.data.pipeline import ArrayLoader
    from sls_tpu.train.loop import Trainer
    from tests.test_detector_train import (
        WAV_LEN,
        synthetic_batch,
        tiny_model_config,
    )

    # Same global dataset on both hosts (same seed); each host then takes
    # its strided shard — the DatasetIndex.host_shard layout.
    rng = np.random.default_rng(0)
    wav_tr, y_tr = synthetic_batch(rng, 48)
    wav_va, y_va = synthetic_batch(rng, 24)
    wav_tr, y_tr = np.asarray(wav_tr), np.asarray(y_tr)
    wav_va, y_va = np.asarray(wav_va), np.asarray(y_va)
    tr_sel = np.arange(48)[pid::2]  # train shards MUST be equal-length
    # val/score shards are deliberately UNEVEN (14/10 and 17/7): eval
    # runs per-host on the local mesh, so hosts may execute different
    # batch counts; cross-host metric reduction uses the ragged gather
    va_sel = np.arange(24)[:14] if pid == 0 else np.arange(24)[14:]
    sc_sel = np.arange(24)[:17] if pid == 0 else np.arange(24)[17:]

    cfg = ExperimentConfig(
        model=tiny_model_config(),
        train=TrainConfig(
            batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=2),
        ),
    )
    trainer = Trainer(cfg, run_dir, tensorboard=False)
    assert trainer.io_primary == (pid == 0)
    assert trainer.eval_mesh is not trainer.mesh
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))

    train_loader = ArrayLoader(
        wav_tr[tr_sel], y_tr[tr_sel], batch_size=8, shuffle=True
    )
    val_loader = ArrayLoader(wav_va[va_sel], y_va[va_sel], batch_size=8)
    trainer.fit(train_loader, val_loader)

    va = trainer.validate(val_loader)

    score_loader = ArrayLoader(
        wav_va[sc_sel], None,
        utt_ids=[f"utt_{i}" for i in sc_sel], batch_size=8,
    )
    n_scored = trainer.produce_scores(score_loader, f"{run_dir}/scores.txt")

    # eval-params cache must invalidate when params are REPLACED without
    # a step change (the resume/migration scenario): zeroed params must
    # change the val loss even though state.step is unchanged
    from sls_tpu.parallel.mesh import replicate

    zeroed = jax.tree.map(
        lambda x: np.zeros_like(np.asarray(x)), jax.device_get(
            trainer.state.params
        )
    )
    trainer.state = trainer.state.replace(
        params=replicate(zeroed, trainer.mesh)
    )
    va_zero = trainer.validate(val_loader)
    assert abs(float(va_zero.loss) - float(va.loss)) > 1e-6, (
        "stale eval-params cache: zeroed params gave the same val loss"
    )

    print(json.dumps({
        "pid": pid,
        "val_loss": round(float(va.loss), 6),
        "val_eer": round(float(va.eer), 6),
        "val_acc": round(float(va.acc), 6),
        "n_scored": int(n_scored),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
