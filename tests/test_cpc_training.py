"""CPC model end-to-end training (the train_cpc.py equivalent path) and
the driver entry points."""

import dataclasses

import numpy as np
import pytest

from sls_tpu.config import (
    CPCConfig,
    ExperimentConfig,
    RawBoostConfig,
    SAEConfig,
    TrainConfig,
)
from sls_tpu.data.pipeline import ArrayLoader
from sls_tpu.train.loop import Trainer
from tests.test_detector_train import WAV_LEN, synthetic_batch, tiny_model_config


@pytest.mark.slow
def test_cpc_trainer_epoch(tmp_path):
    """Three-loss CPC training through the Trainer (reference:
    train_cpc.py:165-232 train_epoch with cls/sae/cpc logging)."""
    cfg = ExperimentConfig(
        model=tiny_model_config(
            use_cpc=True,
            sae=SAEConfig(activation_dim=64, dict_size=256, k=32,
                          variant="window_hard", window_size=4),
            cpc=CPCConfig(hidden_dim=32, prediction_steps=(1, 2)),
        ),
        train=TrainConfig(
            batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
            cpc_weight=0.5,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
        ),
    )
    rng = np.random.default_rng(0)
    wav, y = synthetic_batch(rng, 16)
    loader = ArrayLoader(np.asarray(wav), np.asarray(y), batch_size=8)

    trainer = Trainer(cfg, tmp_path, tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    metrics = trainer.train_epoch(loader, 0)
    assert np.isfinite(metrics.loss)
    assert metrics.cpc_loss > 0  # CPC branch actually contributed
    assert metrics.sae_loss > 0

    rows = None  # csv written only by fit(); train_epoch alone is fine


def test_dryrun_multichip_8(monkeypatch):
    """The driver's multi-chip contract on the 8-device CPU mesh.

    Phase 5 (the real-width executed proxy, ~3 min on this 1-core
    image) is skipped here to keep the fast tier fast — the driver runs
    it every round, and it executed end-to-end when introduced
    (MULTICHIP_r05)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as entrypoints

    monkeypatch.setenv("SLS_TPU_DRYRUN_SKIP_REAL_WIDTH", "1")
    entrypoints.dryrun_multichip(8)


def test_entry_signature():
    import __graft_entry__ as entrypoints

    fn, args = entrypoints.entry.__code__, None
    # entry() builds the 300M flagship — too heavy for unit tests; just
    # validate it is importable and callable-shaped
    assert callable(entrypoints.entry)


def test_cpc_negatives_span_global_batch_under_sharding():
    """InfoNCE negatives must span the GLOBAL batch when the features are
    sharded over the data mesh (reference semantics: cross-batch
    negatives in one process, model_cpc.py:473-528).  If XLA partitioned
    the [M, M] logits with per-shard softmax denominators, the sharded
    loss would differ from the single-device loss on the same batch.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sls_tpu.parallel.mesh import make_mesh
    from sls_tpu.sae.cpc import CPCHead

    mesh = make_mesh()
    model = CPCHead(CPCConfig(hidden_dim=32, prediction_steps=(1, 2, 4)))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(16, 6, 64)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats)

    loss_single = float(model.apply(params, feats))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    loss_sharded = float(
        jax.jit(model.apply, in_shardings=(repl, data))(
            params, jax.device_put(feats, data)
        )
    )
    assert np.isfinite(loss_single) and loss_single > 0
    np.testing.assert_allclose(loss_sharded, loss_single, atol=1e-5, rtol=1e-5)

    # and a shuffled-shard control: if negatives were per-shard, putting
    # all hard negatives on one device would change the loss; global
    # semantics are permutation-covariant so reordering rows must not
    # change the mean loss (diagonal positives follow the rows).
    perm = np.asarray([15, 3, 8, 0, 12, 5, 10, 1, 14, 7, 2, 9, 4, 13, 6, 11])
    loss_perm = float(
        jax.jit(model.apply, in_shardings=(repl, data))(
            params, jax.device_put(feats[perm], data)
        )
    )
    np.testing.assert_allclose(loss_perm, loss_single, atol=1e-5, rtol=1e-5)
