"""Golden parity test against HuggingFace's Wav2Vec2Model.

The strongest available parity evidence without the real XLS-R weights:
HF's Wav2Vec2 is the canonical public port of the same fairseq
architecture the reference loads (reference: model.py:109-126).  A
randomly-initialized HF model with XLS-R topology (stable layer norm,
layer-norm feature extractor) is exported, converted with
``hf_encoder_to_flax``, and outputs are compared elementwise.
"""

import numpy as np
import pytest
import torch

from sls_tpu.config import tiny_xlsr_config
from sls_tpu.encoder.convert import hf_encoder_to_flax
from sls_tpu.encoder.xlsr import XLSREncoder

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = tiny_xlsr_config()
    hf_cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=cfg.embed_dim,
        num_hidden_layers=cfg.encoder_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.ffn_dim,
        hidden_act="gelu",
        conv_dim=[c for c, _, _ in cfg.conv_layers],
        conv_kernel=[k for _, k, _ in cfg.conv_layers],
        conv_stride=[s for _, _, s in cfg.conv_layers],
        conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.conv_pos,
        num_conv_pos_embedding_groups=cfg.conv_pos_groups,
        do_stable_layer_norm=True,       # XLS-R pre-LN mode
        feat_extract_norm="layer",       # per-conv LayerNorm
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf_model = Wav2Vec2Model(hf_cfg).eval()
    return cfg, hf_model


def test_flax_matches_hf_wav2vec2(hf_pair):
    cfg, hf_model = hf_pair
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = {"params": hf_encoder_to_flax(state, cfg)}

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 1000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(wav)).last_hidden_state.numpy()

    import jax.numpy as jnp

    out = np.asarray(XLSREncoder(cfg).apply(params, jnp.asarray(wav)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)


def test_hidden_states_match_hf(hf_pair):
    """Per-layer hidden states (for the SLS head) line up with HF's
    output_hidden_states trace."""
    cfg, hf_model = hf_pair
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = {"params": hf_encoder_to_flax(state, cfg)}

    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(1, 1000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(wav), output_hidden_states=True)
    # HF hidden_states: (embedding_out, layer_1, ..., layer_N); for the
    # stable-LN variant the last entry has the final LN applied
    hf_hiddens = [h.numpy() for h in hf_out.hidden_states]

    import jax.numpy as jnp

    final, ours = XLSREncoder(cfg).apply(
        params, jnp.asarray(wav), return_hidden_states=True
    )
    assert len(ours) == cfg.encoder_layers
    # intermediate layers are pre-final-LN on both sides
    for i in range(cfg.encoder_layers - 1):
        np.testing.assert_allclose(
            np.asarray(ours[i]), hf_hiddens[i + 1], atol=3e-4, rtol=3e-4
        )
