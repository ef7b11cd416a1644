"""Round-trip through a REAL serialized fairseq-style checkpoint file.

The converter functions are golden-tested against in-memory state
dicts, but the file that will actually arrive one day — ``xlsr2_300m.pt``
(reference: model.py:109-126, loaded via fairseq.checkpoint_utils) — is
a torch.save pickle with:

  - a ``cfg``/``args`` payload of argparse.Namespace objects that the
    ``weights_only=True`` unpickler REFUSES (the default-path failure
    this test exists to keep fixed),
  - the full pretraining parameter set (quantizer, project_q, mask_emb,
    final_proj) that the features_only inference path must ignore
    (SURVEY §2.1: the pretraining branch is dead at runtime),
  - weight-normed pos_conv as weight_g/weight_v,
  - fairseq bookkeeping (optimizer_history, extra_state, ...).

This synthesizes exactly that file shape, loads it through the SAME
code path the CLI uses for --cp_path (cli.main.load_pretrained_encoder),
and asserts forward parity against the independent torch-functional
reference — so the loader that will touch the real weights has zero
never-executed branches.
"""

import argparse
from collections import OrderedDict

import numpy as np
import pytest
import torch

from sls_tpu.cli.main import load_pretrained_encoder
from sls_tpu.config import tiny_xlsr_config
from sls_tpu.encoder.torch_ref import make_fairseq_state, torch_reference_forward

WAV_LEN = 1200


def _fairseq_checkpoint_dict(state):
    """A checkpoint shaped like a real fairseq wav2vec2 save."""
    model = OrderedDict(
        (k, torch.from_numpy(np.asarray(v))) for k, v in state.items()
    )
    # pretraining-only parameters present in xlsr2_300m.pt that the
    # inference converter must skip (wav2vec2.py:256-770 pretraining path)
    C = state["post_extract_proj.weight"].shape[0]
    last = state["post_extract_proj.weight"].shape[1]
    model["quantizer.vars"] = torch.randn(1, 640, 128)
    model["quantizer.weight_proj.weight"] = torch.randn(640, last)
    model["quantizer.weight_proj.bias"] = torch.randn(640)
    model["project_q.weight"] = torch.randn(256, 128 * 2)
    model["project_q.bias"] = torch.randn(256)
    model["final_proj.weight"] = torch.randn(256, C)
    model["final_proj.bias"] = torch.randn(256)
    model["mask_emb"] = torch.randn(C)

    args = argparse.Namespace(
        arch="wav2vec2", extractor_mode="layer_norm", encoder_layers=2,
        encoder_embed_dim=C, fp16=False,
    )
    return {
        "args": args,
        "cfg": {"model": vars(args), "task": {"_name": "audio_pretraining"}},
        "model": model,
        "optimizer_history": [
            {"criterion_name": "Wav2vecCriterion", "num_updates": 400000}
        ],
        "extra_state": {"metrics": {}, "previous_training_time": 1.0},
        "last_optimizer_state": {},
    }


@pytest.fixture(scope="module")
def ckpt_file(tmp_path_factory):
    cfg = tiny_xlsr_config()
    state = make_fairseq_state(cfg, seed=4)
    path = tmp_path_factory.mktemp("fairseq") / "xlsr2_300m.pt"
    torch.save(_fairseq_checkpoint_dict(state), path)
    return cfg, state, path


def test_weights_only_unpickler_refuses_the_real_shape(ckpt_file):
    """Documents WHY load_pretrained_encoder needs the fallback: the cfg
    payload is exactly what weights_only=True rejects.  If a future
    torch version starts allowing it, this test tells us the fallback
    became dead code (harmless) rather than silently rotting."""
    _, _, path = ckpt_file
    try:
        torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return  # expected on current torch
    pytest.skip("torch now allows Namespace under weights_only=True")


def test_load_pretrained_encoder_from_fairseq_file(ckpt_file):
    import jax.numpy as jnp

    from sls_tpu.encoder.xlsr import XLSREncoder

    cfg, state, path = ckpt_file
    params = load_pretrained_encoder(str(path), cfg)

    wav = np.random.default_rng(3).normal(0, 0.2, (2, WAV_LEN)).astype(
        np.float32
    )
    golden = torch_reference_forward(state, cfg, wav)
    out = np.asarray(
        XLSREncoder(cfg).apply({"params": params}, jnp.asarray(wav),
                               train=False)
    )
    scale = float(np.abs(golden).mean())
    assert np.abs(out - golden).max() / scale < 5e-3


def test_load_pretrained_encoder_asr_prefixed_variant(ckpt_file, tmp_path):
    """ASR fine-tunes save the encoder under a ``w2v_encoder.w2v_model.``
    prefix (reference fallback ckpt xlsr_53_56k-style layouts); the
    loader's strip_prefixes chain must land on the same params."""
    import jax

    cfg, state, _ = ckpt_file
    prefixed = OrderedDict(
        (f"w2v_encoder.w2v_model.{k}", torch.from_numpy(np.asarray(v)))
        for k, v in state.items()
    )
    path = tmp_path / "asr_finetuned.pt"
    torch.save({"model": prefixed, "args": argparse.Namespace(a=1)}, path)

    params = load_pretrained_encoder(str(path), cfg)

    # same leaves as converting the bare state directly
    from sls_tpu.encoder.convert import fairseq_encoder_to_flax

    direct = fairseq_encoder_to_flax(state, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(direct))
    assert len(flat_a) == len(flat_b)
    for path_k, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path_k]))
