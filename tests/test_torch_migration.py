"""Migration path: loading reference-format PyTorch detector checkpoints."""

import dataclasses

import jax
import numpy as np
import pytest
import torch

from sls_tpu.config import ExperimentConfig, RawBoostConfig, TrainConfig
from sls_tpu.encoder.convert import detector_state_to_flax
from sls_tpu.train.loop import Trainer
from tests.test_detector_train import WAV_LEN, tiny_model_config
from tests.test_encoder import make_fairseq_state


def make_torch_detector_state(model_cfg, seed=0, with_module_prefix=False):
    """Reference-named detector state: ssl_model.model.* + sae.* +
    classifier.{0,1,4} (reference: model.py submodule names)."""
    rng = np.random.default_rng(seed)
    enc = make_fairseq_state(model_cfg.encoder, seed=seed)
    state = {f"ssl_model.model.{k}": v for k, v in enc.items()}

    D = model_cfg.sae.activation_dim
    M = model_cfg.sae.dict_size
    H = model_cfg.classifier_hidden
    in_dim = model_cfg.classifier_input_dim
    state.update({
        "sae.encoder.weight": rng.normal(size=(M, D)).astype(np.float32) * 0.05,
        "sae.encoder.bias": np.zeros(M, np.float32),
        "sae.decoder.weight": rng.normal(size=(D, M)).astype(np.float32) * 0.05,
        "sae.b_dec": np.zeros(D, np.float32),
        "sae.k": np.asarray(model_cfg.sae.k),
        "classifier.0.weight": np.ones(in_dim, np.float32),
        "classifier.0.bias": np.zeros(in_dim, np.float32),
        "classifier.1.weight": rng.normal(size=(H, in_dim)).astype(np.float32) * 0.05,
        "classifier.1.bias": np.zeros(H, np.float32),
        "classifier.4.weight": rng.normal(size=(2, H)).astype(np.float32) * 0.05,
        "classifier.4.bias": np.zeros(2, np.float32),
    })
    if with_module_prefix:
        state = {f"module.{k}": v for k, v in state.items()}
    return state


@pytest.fixture(scope="module")
def cfg():
    return ExperimentConfig(
        model=tiny_model_config(),
        train=TrainConfig(
            batch_size=4, cut_length=WAV_LEN,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
        ),
    )


def test_converted_tree_matches_init_structure(cfg):
    from sls_tpu.models.detector import Detector

    state = make_torch_detector_state(cfg.model)
    params = detector_state_to_flax(state, cfg.model)

    model = Detector(cfg.model)
    import jax.numpy as jnp

    init_params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, WAV_LEN)))[
        "params"
    ]
    init_shapes = jax.tree.map(lambda x: x.shape, init_params)
    conv_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
    assert init_shapes == conv_shapes


def test_dataparallel_prefix_stripped(cfg):
    state = make_torch_detector_state(cfg.model, with_module_prefix=True)
    params = detector_state_to_flax(state, cfg.model)
    assert "encoder" in params and "sae" in params


def test_trainer_resume_from_torch_pth(cfg, tmp_path):
    state = make_torch_detector_state(cfg.model)
    ckpt = {
        "model": {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
        "epoch": 4,
    }
    path = tmp_path / "best_checkpoint_eer.pth"
    torch.save(ckpt, path)

    trainer = Trainer(cfg, tmp_path / "run", tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    assert trainer.resume(str(path))
    assert trainer.start_epoch == 5

    # converted weights actually drive the model
    from sls_tpu.data.pipeline import ArrayLoader

    rng = np.random.default_rng(0)
    wavs = rng.normal(0, 0.1, (8, WAV_LEN)).astype(np.float32)
    loader = ArrayLoader(wavs, None, batch_size=4)
    out_path = tmp_path / "scores.txt"
    n = trainer.produce_scores(loader, out_path)
    assert n == 8


def test_epoch_inference_from_filename(cfg, tmp_path):
    state = make_torch_detector_state(cfg.model)
    ckpt = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    path = tmp_path / "checkpoint_epoch_11.pth"
    torch.save(ckpt, path)  # weights-only, no 'epoch' key

    trainer = Trainer(cfg, tmp_path / "run2", tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    assert trainer.resume(str(path))
    assert trainer.start_epoch == 12
