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


def test_dryrun_multichip_8():
    """The driver's multi-chip contract on the 8-device CPU mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as entrypoints

    entrypoints.dryrun_multichip(8)


def test_entry_signature():
    import __graft_entry__ as entrypoints

    fn, args = entrypoints.entry.__code__, None
    # entry() builds the 300M flagship — too heavy for unit tests; just
    # validate it is importable and callable-shaped
    assert callable(entrypoints.entry)
