"""Golden tests for the Flax XLS-R encoder.

An independent torch-functional implementation of the wav2vec2 inference
semantics (conv front-end + pre-LN transformer; reference behavior at
wav2vec/wav2vec2.py:540-647) is evaluated with the SAME weights — built as
a fairseq-style state dict and converted through
sls_tpu.encoder.convert.fairseq_encoder_to_flax — and outputs are compared
elementwise.  This validates both the encoder math and the converter's
name/layout mapping (including the weight-norm pos_conv fold).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sls_tpu.config import XLSRConfig, tiny_xlsr_config
from sls_tpu.encoder.convert import fairseq_encoder_to_flax, fold_weight_norm
from sls_tpu.encoder.torch_ref import make_fairseq_state, torch_reference_forward
from sls_tpu.encoder.xlsr import XLSREncoder

T_ = torch.from_numpy


@pytest.fixture(scope="module")
def tiny_cfg():
    return tiny_xlsr_config()


def test_frame_count_formula(tiny_cfg):
    full = XLSRConfig()
    assert full.num_frames(64600) == 201  # reference: ~201 frames @ 1024-d
    # tiny config: (1000-10)/5+1=199 -> (199-3)/2+1=99 -> (99-2)/2+1=49
    assert tiny_cfg.num_frames(1000) == 49


def test_golden_vs_torch(tiny_cfg):
    cfg = tiny_cfg
    state = make_fairseq_state(cfg)
    wav = (np.random.default_rng(1).normal(size=(2, 1000)) * 0.1).astype(np.float32)

    ref = torch_reference_forward(state, cfg, wav)

    params = {"params": fairseq_encoder_to_flax(state, cfg)}
    enc = XLSREncoder(cfg)
    out = np.asarray(enc.apply(params, jnp.asarray(wav)))

    assert out.shape == ref.shape == (2, 49, cfg.embed_dim)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_golden_vs_torch_groupnorm_mode():
    cfg = tiny_xlsr_config(extractor_mode="default", conv_bias=False)
    state = make_fairseq_state(cfg)
    # default mode: group-norm on first conv only
    state = {
        k: v
        for k, v in state.items()
        if not (".conv_layers." in k and ".2.1." in k)
    }
    dim0 = cfg.conv_layers[0][0]
    state["feature_extractor.conv_layers.0.2.weight"] = np.ones(dim0, np.float32)
    state["feature_extractor.conv_layers.0.2.bias"] = np.zeros(dim0, np.float32)

    def torch_fwd(s, wav):
        with torch.no_grad():
            x = T_(wav)[:, None, :]
            for i, (dim, k, stride) in enumerate(cfg.conv_layers):
                base = f"feature_extractor.conv_layers.{i}"
                x = F.conv1d(x, T_(s[f"{base}.0.weight"]), None, stride=stride)
                if i == 0:
                    x = F.group_norm(x, dim, T_(s[f"{base}.2.weight"]),
                                     T_(s[f"{base}.2.bias"]))
                x = F.gelu(x)
            return x.transpose(1, 2).numpy()

    wav = (np.random.default_rng(2).normal(size=(2, 500)) * 0.1).astype(np.float32)
    ref = torch_fwd(state, wav)

    from sls_tpu.encoder.xlsr import ConvFeatureExtractor

    params = {"params": fairseq_encoder_to_flax(state, cfg)["feature_extractor"]}
    out = np.asarray(ConvFeatureExtractor(cfg).apply(params, jnp.asarray(wav)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_hidden_states_collection(tiny_cfg):
    cfg = tiny_cfg
    enc = XLSREncoder(cfg)
    wav = jnp.zeros((1, 1000))
    params = enc.init(jax.random.PRNGKey(0), wav)
    out, hiddens = enc.apply(params, wav, return_hidden_states=True)
    assert len(hiddens) == cfg.encoder_layers
    assert all(h.shape == out.shape for h in hiddens)


def test_bf16_path_runs_and_tracks_fp32(tiny_cfg):
    cfg32 = tiny_cfg
    cfg16 = tiny_xlsr_config(dtype=jnp.bfloat16)
    state = make_fairseq_state(cfg32)
    params = {"params": fairseq_encoder_to_flax(state, cfg32)}
    wav = (np.random.default_rng(3).normal(size=(2, 1000)) * 0.1).astype(np.float32)

    out32 = np.asarray(XLSREncoder(cfg32).apply(params, jnp.asarray(wav)))
    out16 = np.asarray(XLSREncoder(cfg16).apply(params, jnp.asarray(wav))).astype(
        np.float32
    )
    # bf16 matmuls with fp32 norm islands should stay within ~1e-1 of fp32
    # for unit-scale activations
    err = np.abs(out32 - out16).mean() / (np.abs(out32).mean() + 1e-9)
    assert err < 0.1


def test_jit_and_deterministic(tiny_cfg):
    cfg = tiny_cfg
    enc = XLSREncoder(cfg)
    wav = jnp.asarray(np.random.default_rng(4).normal(size=(2, 1000)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), wav)
    f = jax.jit(lambda p, w: enc.apply(p, w))
    a, b = f(params, wav), f(params, wav)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_parity_cli_on_synthetic_checkpoint(tmp_path, capsys):
    """The real-weight parity harness end to end on a synthetic fairseq
    checkpoint (full naming scheme, tiny dims)."""
    from sls_tpu.encoder.parity import run_parity

    cfg = tiny_xlsr_config()
    state = make_fairseq_state(cfg)
    ckpt = tmp_path / "synthetic_xlsr.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in state.items()}},
               ckpt)

    ok = run_parity(str(ckpt), fmt="fairseq", cfg=cfg)
    out = capsys.readouterr().out
    assert "PARITY OK" in out
    assert ok
