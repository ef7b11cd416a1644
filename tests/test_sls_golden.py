"""Golden parity of the SLS model vs a torch-functional reference.

The SLS head architecture (getAttenF -> fc0/sigmoid -> gate-weighted
layer sum -> BatchNorm2d(1) -> SELU -> max_pool2d(3,3) -> fc1 -> SELU ->
fc3 -> SELU -> log_softmax; remnant at reference model_backup.py:186-201)
is verified elementwise on random weights, and the upstream-.pth
migration path is exercised end to end through SLSTrainer.resume.
"""

import numpy as np
import pytest

from sls_tpu.config import ExperimentConfig, ModelConfig, TrainConfig, tiny_xlsr_config
from sls_tpu.encoder.convert import (
    fairseq_encoder_to_flax,
    sls_detector_state_to_flax,
)
from sls_tpu.encoder.torch_ref import (
    make_fairseq_state,
    make_sls_head_state,
    torch_sls_forward,
)

WAV_LEN = 2000


def _configs():
    enc_cfg = tiny_xlsr_config()
    model_cfg = ModelConfig(encoder=enc_cfg)
    return enc_cfg, model_cfg


def _flat_dim(enc_cfg, wav_len=WAV_LEN):
    """floor(T/3) * floor(C/3) after the conv stack."""
    t = wav_len
    for _, k, s in enc_cfg.conv_layers:
        t = (t - k) // s + 1
    return (t // 3) * (enc_cfg.embed_dim // 3)


def _upstream_state(enc_cfg):
    enc_state = make_fairseq_state(enc_cfg, seed=0)
    head_state = make_sls_head_state(
        seed=1, flat_dim=_flat_dim(enc_cfg), embed_dim=enc_cfg.embed_dim
    )
    full = {f"ssl_model.model.{k}": v for k, v in enc_state.items()}
    full.update(head_state)
    return enc_state, head_state, full


def test_sls_golden_logprobs():
    """Flax SLSDetector == torch-functional upstream forward, elementwise."""
    import jax.numpy as jnp

    from sls_tpu.models.sls import SLSDetector

    enc_cfg, model_cfg = _configs()
    enc_state, head_state, full = _upstream_state(enc_cfg)

    rng = np.random.default_rng(7)
    wav = rng.normal(0, 0.3, size=(3, WAV_LEN)).astype(np.float32)

    golden = torch_sls_forward(enc_state, head_state, enc_cfg, wav)

    variables = sls_detector_state_to_flax(full, model_cfg)
    model = SLSDetector(model_cfg)
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(wav), train=False,
    )
    got = np.asarray(out["log_probs"])
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, atol=2e-4, rtol=1e-4)
    # scores are exp of the bonafide column
    np.testing.assert_allclose(
        np.asarray(out["score"]), np.exp(golden[:, 1]), atol=2e-4
    )


def test_sls_golden_dataparallel_prefix():
    """'module.'-prefixed upstream checkpoints convert identically."""
    enc_cfg, model_cfg = _configs()
    _, _, full = _upstream_state(enc_cfg)
    prefixed = {f"module.{k}": v for k, v in full.items()}
    a = sls_detector_state_to_flax(full, model_cfg)
    b = sls_detector_state_to_flax(prefixed, model_cfg)
    import jax

    jax.tree_util.tree_map(np.testing.assert_array_equal, a, b)


def test_sls_trainer_resume_from_pth(tmp_path):
    """SLSTrainer.resume('*.pth') loads upstream torch weights and scores
    identically to the directly-converted variables."""
    import jax.numpy as jnp
    import torch

    from sls_tpu.models.sls import SLSDetector, SLSTrainer

    enc_cfg, model_cfg = _configs()
    enc_state, head_state, full = _upstream_state(enc_cfg)
    pth = tmp_path / "best_checkpoint_eer_epoch_12.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in full.items()},
                "epoch": 12}, pth)

    cfg = ExperimentConfig(
        model=model_cfg,
        train=TrainConfig(batch_size=4, cut_length=WAV_LEN),
    )
    trainer = SLSTrainer(cfg, tmp_path / "run", tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    assert trainer.resume(explicit_path=str(pth))
    assert trainer.start_epoch == 13

    rng = np.random.default_rng(3)
    # batch divisible by the 8-device test mesh (_run_eval shards on 'data')
    wav = rng.normal(0, 0.3, size=(8, WAV_LEN)).astype(np.float32)
    golden = torch_sls_forward(enc_state, head_state, enc_cfg, wav)
    out = trainer._run_eval(jnp.asarray(wav))
    np.testing.assert_allclose(
        np.asarray(out["log_probs"]), golden, atol=2e-4, rtol=1e-4
    )
