"""PyTorch/fairseq checkpoint -> Flax parameter conversion.

Maps fairseq wav2vec2 state-dict naming (as produced by
``fairseq.checkpoint_utils``; reference loads it at model.py:109-126) and
the reference project's own detector checkpoints (``main.py:753-764`` dict
checkpoints with optional DataParallel ``module.`` prefixes,
main.py:542-560) onto this framework's parameter tree.

Layout conversions:
- torch Linear  [out, in]        -> flax Dense kernel [in, out]
- torch Conv1d  [out, in/g, k]   -> flax Conv kernel  [k, in/g, out]
- torch LayerNorm weight         -> flax LayerNorm scale
- weight-normed pos_conv (weight_g/weight_v, dim=2) is folded into a
  single kernel: w[:, :, j] = g[j] * v[:, :, j] / ||v[:, :, j]||
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from sls_tpu.config import ModelConfig, SAEConfig, XLSRConfig

ArrayDict = Dict[str, np.ndarray]


def strip_prefixes(state: Mapping[str, Any], prefixes=("module.",)) -> ArrayDict:
    """Remove DataParallel-style name prefixes (reference: main.py:542-560)."""
    out = {}
    for key, value in state.items():
        for p in prefixes:
            while key.startswith(p):
                key = key[len(p):]
        out[key] = np.asarray(value)
    return out


def _linear(state: ArrayDict, name: str) -> Dict[str, np.ndarray]:
    p = {"kernel": state[f"{name}.weight"].T}
    if f"{name}.bias" in state:
        p["bias"] = state[f"{name}.bias"]
    return p


def _layernorm(state: ArrayDict, name: str) -> Dict[str, Any]:
    return {
        "LayerNorm_0": {
            "scale": state[f"{name}.weight"],
            "bias": state[f"{name}.bias"],
        }
    }


def _conv1d(state: ArrayDict, name: str) -> Dict[str, np.ndarray]:
    p = {"kernel": np.transpose(state[f"{name}.weight"], (2, 1, 0))}
    if f"{name}.bias" in state:
        p["bias"] = state[f"{name}.bias"]
    return p


def fold_weight_norm(g: np.ndarray, v: np.ndarray, dim: int = 2) -> np.ndarray:
    """Fold torch weight-norm (norm over all dims except ``dim``) into a
    plain weight tensor."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g * v / norm).astype(v.dtype)


def fairseq_encoder_to_flax(
    state: Mapping[str, Any], cfg: XLSRConfig
) -> Dict[str, Any]:
    """Convert a fairseq Wav2Vec2Model state dict to XLSREncoder params.

    Accepts raw fairseq names (``feature_extractor.conv_layers.0.0.weight``
    etc.); callers should strip any wrapping prefixes first.
    """
    s = strip_prefixes(state)
    params: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_layers)):
        base = f"feature_extractor.conv_layers.{i}"
        fe[f"conv_{i}"] = _conv1d(s, f"{base}.0")
        if cfg.extractor_mode == "layer_norm":
            # Sequential(conv, dropout, Sequential(T, LN, T), gelu) -> .2.1
            fe[f"norm_{i}"] = _layernorm(s, f"{base}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["norm_0"] = {
                "GroupNorm_0": {
                    "scale": s[f"{base}.2.weight"],
                    "bias": s[f"{base}.2.bias"],
                }
            }
    params["feature_extractor"] = fe

    params["post_extract_norm"] = _layernorm(s, "layer_norm")
    params["post_extract_proj"] = _linear(s, "post_extract_proj")

    # pos_conv: Sequential(weight_norm(conv), SamePad, GELU) -> index 0
    if "encoder.pos_conv.0.weight_g" in s:
        w = fold_weight_norm(
            s["encoder.pos_conv.0.weight_g"], s["encoder.pos_conv.0.weight_v"]
        )
    elif "encoder.pos_conv.0.parametrizations.weight.original0" in s:
        w = fold_weight_norm(
            s["encoder.pos_conv.0.parametrizations.weight.original0"],
            s["encoder.pos_conv.0.parametrizations.weight.original1"],
        )
    else:
        w = s["encoder.pos_conv.0.weight"]
    params["pos_conv"] = {
        "conv": {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": s["encoder.pos_conv.0.bias"],
        }
    }

    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": {
                proj: _linear(s, f"{base}.self_attn.{proj}")
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "self_attn_layer_norm": _layernorm(s, f"{base}.self_attn_layer_norm"),
            "fc1": _linear(s, f"{base}.fc1"),
            "fc2": _linear(s, f"{base}.fc2"),
            "final_layer_norm": _layernorm(s, f"{base}.final_layer_norm"),
        }

    params["encoder_layer_norm"] = _layernorm(s, "encoder.layer_norm")
    return params


def hf_encoder_to_flax(
    state: Mapping[str, Any], cfg: XLSRConfig
) -> Dict[str, Any]:
    """Convert a HuggingFace ``Wav2Vec2Model`` state dict to XLSREncoder
    params.

    Supports the XLS-R layout (``do_stable_layer_norm=True``,
    ``feat_extract_norm='layer'``) — HF's port of the same fairseq
    checkpoints, useful both as an independent golden reference and as a
    weights source when only HF-format XLS-R weights are on disk.
    """
    s = strip_prefixes(state, ("wav2vec2.",))
    params: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_layers)):
        base = f"feature_extractor.conv_layers.{i}"
        fe[f"conv_{i}"] = _conv1d(s, f"{base}.conv")
        if cfg.extractor_mode == "layer_norm":
            fe[f"norm_{i}"] = _layernorm(s, f"{base}.layer_norm")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["norm_0"] = {
                "GroupNorm_0": {
                    "scale": s[f"{base}.layer_norm.weight"],
                    "bias": s[f"{base}.layer_norm.bias"],
                }
            }
    params["feature_extractor"] = fe

    params["post_extract_norm"] = _layernorm(s, "feature_projection.layer_norm")
    params["post_extract_proj"] = _linear(s, "feature_projection.projection")

    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in s:
        w = fold_weight_norm(s[f"{pc}.weight_g"], s[f"{pc}.weight_v"])
    elif f"{pc}.parametrizations.weight.original0" in s:
        w = fold_weight_norm(
            s[f"{pc}.parametrizations.weight.original0"],
            s[f"{pc}.parametrizations.weight.original1"],
        )
    else:
        w = s[f"{pc}.weight"]
    params["pos_conv"] = {
        "conv": {"kernel": np.transpose(w, (2, 1, 0)), "bias": s[f"{pc}.bias"]}
    }

    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": {
                proj: _linear(s, f"{base}.attention.{proj}")
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "self_attn_layer_norm": _layernorm(s, f"{base}.layer_norm"),
            "fc1": _linear(s, f"{base}.feed_forward.intermediate_dense"),
            "fc2": _linear(s, f"{base}.feed_forward.output_dense"),
            "final_layer_norm": _layernorm(s, f"{base}.final_layer_norm"),
        }

    params["encoder_layer_norm"] = _layernorm(s, "encoder.layer_norm")
    return params


def sae_state_to_flax(state: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Convert a reference AutoEncoderTopK state dict (model.py:42-104):
    encoder.weight [M,D], encoder.bias, decoder.weight [D,M], b_dec, k."""
    s = strip_prefixes(state)
    return {
        "W_enc": s[f"{prefix}encoder.weight"].T,
        "b_enc": s[f"{prefix}encoder.bias"],
        "W_dec": s[f"{prefix}decoder.weight"].T,
        "b_dec": s[f"{prefix}b_dec"],
    }


def classifier_state_to_flax(
    state: Mapping[str, Any], prefix: str = "classifier."
) -> Dict[str, Any]:
    """Convert the reference classifier Sequential (model.py:183-189):
    0=LayerNorm, 1=Linear(d,256), 4=Linear(256,2)."""
    s = strip_prefixes(state)
    return {
        "norm": {"scale": s[f"{prefix}0.weight"], "bias": s[f"{prefix}0.bias"]},
        "fc1": _linear(s, f"{prefix}1"),
        "fc2": _linear(s, f"{prefix}4"),
    }


def detector_state_to_flax(
    state: Mapping[str, Any], cfg: ModelConfig
) -> Dict[str, Any]:
    """Convert a full reference detector checkpoint ('model' entry of the
    dict checkpoint, main.py:753-764) to Detector params.

    Reference submodule names: ssl_model.model.* (fairseq encoder),
    sae.*, classifier.*, cpc_proj.* / cpc_pred.* (CPC variant).
    """
    s = strip_prefixes(state)

    enc_state = {
        k[len("ssl_model.model."):]: v
        for k, v in s.items()
        if k.startswith("ssl_model.model.")
    }
    params: Dict[str, Any] = {
        "encoder": fairseq_encoder_to_flax(enc_state, cfg.encoder)
    }

    if cfg.use_sae:
        sae_state = {k: v for k, v in s.items() if k.startswith("sae.")}
        params["sae"] = sae_state_to_flax(sae_state, prefix="sae.")

    params["classifier"] = classifier_state_to_flax(s, prefix="classifier.")

    if cfg.use_cpc and any(k.startswith("cpc_proj.") for k in s):
        params["cpc"] = {
            "proj_fc1": _linear(s, "cpc_proj.0"),
            "proj_fc2": _linear(s, "cpc_proj.2"),
            "pred_fc1": _linear(s, "cpc_pred.0"),
            "pred_fc2": _linear(s, "cpc_pred.2"),
        }
    return params


def infer_sae_config_from_state(
    state: Mapping[str, Any], prefix: str = "sae."
) -> SAEConfig:
    """Infer dict_size/activation_dim/k from checkpoint weight shapes —
    the reference's checkpoint-as-config idiom
    (test_interpretability.py:33-47)."""
    s = strip_prefixes(state)
    dict_size, activation_dim = s[f"{prefix}encoder.weight"].shape
    k = int(np.asarray(s.get(f"{prefix}k", 128)))
    return SAEConfig(activation_dim=activation_dim, dict_size=dict_size, k=k)


def sls_head_state_to_flax(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert the upstream SLS head parameters (fc0 / first_bn / fc1 /
    fc3; remnant at reference model_backup.py:186-201) to SLSHead params
    + batch_stats collections."""
    s = strip_prefixes(state)
    params = {
        "fc0": _linear(s, "fc0"),
        "first_bn": {
            "scale": s["first_bn.weight"],
            "bias": s["first_bn.bias"],
        },
        "fc1": _linear(s, "fc1"),
        "fc3": _linear(s, "fc3"),
    }
    batch_stats = {
        "first_bn": {
            "mean": s["first_bn.running_mean"],
            "var": s["first_bn.running_var"],
        }
    }
    return {"params": params, "batch_stats": batch_stats}


def sls_detector_state_to_flax(
    state: Mapping[str, Any], cfg: ModelConfig
) -> Dict[str, Any]:
    """Convert a full upstream SLS checkpoint (state dict with
    ssl_model.model.* fairseq encoder + fc0/first_bn/fc1/fc3 head, with
    optional DataParallel 'module.' prefixes) into SLSDetector variables:
    {"params": {encoder, sls_head}, "batch_stats": {sls_head}}.

    This is the migration path for the model behind the headline numbers
    (EER 1.92% DF / 2.87% LA, reference README.md:84-86).
    """
    s = strip_prefixes(state)
    enc_state = {
        k[len("ssl_model.model."):]: v
        for k, v in s.items()
        if k.startswith("ssl_model.model.")
    }
    head = sls_head_state_to_flax(
        {k: v for k, v in s.items() if not k.startswith("ssl_model.")}
    )
    return {
        "params": {
            "encoder": fairseq_encoder_to_flax(enc_state, cfg.encoder),
            "sls_head": head["params"],
        },
        "batch_stats": {"sls_head": head["batch_stats"]},
    }
