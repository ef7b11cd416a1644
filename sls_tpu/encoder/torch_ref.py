"""Torch-functional wav2vec2 reference forward — the parity harness.

An independent, dependency-light (torch-only) implementation of the
fairseq wav2vec2 inference semantics (reference behavior:
wav2vec/wav2vec2.py:540-647) used to verify the Flax encoder and the
weight converters:

- golden unit tests evaluate it against XLSREncoder on random weights
  (tests/test_encoder.py)
- the parity CLI (sls_tpu.encoder.parity) evaluates it against real
  checkpoints when they are available

This is verification tooling, not a compute path; torch imports stay
inside the functions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from sls_tpu.config import XLSRConfig
from sls_tpu.encoder.convert import fold_weight_norm


def make_fairseq_state(
    cfg: XLSRConfig, seed: int = 0, weight_scale: float = 0.2
) -> Dict[str, np.ndarray]:
    """Random fairseq-named wav2vec2 state dict for ``cfg`` (testing).

    ``weight_scale`` sets the base std of matrix weights; the 0.2 default
    is fine at tiny widths but blows activations up to O(100) at the real
    1024-dim topology — pass ~1/sqrt(embed_dim) there when the test needs
    trained-network-like dynamics (e.g. bf16 characterization).
    """
    rng = np.random.default_rng(seed)

    def w(*shape, scale=None):
        scale = weight_scale if scale is None else scale
        return (rng.normal(size=shape) * scale).astype(np.float32)

    s = {}
    in_ch = 1
    for i, (dim, k, _) in enumerate(cfg.conv_layers):
        base = f"feature_extractor.conv_layers.{i}"
        s[f"{base}.0.weight"] = w(dim, in_ch, k)
        if cfg.conv_bias:
            s[f"{base}.0.bias"] = w(dim)
        if cfg.extractor_mode == "layer_norm":
            s[f"{base}.2.1.weight"] = 1.0 + w(dim, scale=0.05)
            s[f"{base}.2.1.bias"] = w(dim, scale=0.05)
        in_ch = dim

    C = cfg.embed_dim
    last = cfg.conv_layers[-1][0]
    s["layer_norm.weight"] = 1.0 + w(last, scale=0.05)
    s["layer_norm.bias"] = w(last, scale=0.05)
    s["post_extract_proj.weight"] = w(C, last)
    s["post_extract_proj.bias"] = w(C)

    s["encoder.pos_conv.0.weight_g"] = np.abs(w(1, 1, cfg.conv_pos)) + 0.5
    s["encoder.pos_conv.0.weight_v"] = w(C, C // cfg.conv_pos_groups, cfg.conv_pos)
    s["encoder.pos_conv.0.bias"] = w(C)

    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[f"{base}.self_attn.{proj}.weight"] = w(C, C)
            s[f"{base}.self_attn.{proj}.bias"] = w(C)
        s[f"{base}.self_attn_layer_norm.weight"] = 1.0 + w(C, scale=0.05)
        s[f"{base}.self_attn_layer_norm.bias"] = w(C, scale=0.05)
        s[f"{base}.fc1.weight"] = w(cfg.ffn_dim, C)
        s[f"{base}.fc1.bias"] = w(cfg.ffn_dim)
        s[f"{base}.fc2.weight"] = w(C, cfg.ffn_dim)
        s[f"{base}.fc2.bias"] = w(C)
        s[f"{base}.final_layer_norm.weight"] = 1.0 + w(C, scale=0.05)
        s[f"{base}.final_layer_norm.bias"] = w(C, scale=0.05)

    s["encoder.layer_norm.weight"] = 1.0 + w(C, scale=0.05)
    s["encoder.layer_norm.bias"] = w(C, scale=0.05)
    return s


def torch_reference_forward(
    s: Dict[str, np.ndarray],
    cfg: XLSRConfig,
    wav: np.ndarray,
    return_stages: bool = False,
):
    """Torch-functional wav2vec2 inference forward (pre-LN / XLS-R mode).

    With ``return_stages`` also returns per-stage activations for
    localizing converter/implementation divergences.
    """
    import torch
    import torch.nn.functional as F

    T_ = torch.from_numpy
    stages: Dict[str, np.ndarray] = {}

    with torch.no_grad():
        x = T_(wav)[:, None, :]
        for i, (dim, k, stride) in enumerate(cfg.conv_layers):
            base = f"feature_extractor.conv_layers.{i}"
            bias = T_(s[f"{base}.0.bias"]) if cfg.conv_bias else None
            x = F.conv1d(x, T_(s[f"{base}.0.weight"]), bias, stride=stride)
            if cfg.extractor_mode == "layer_norm":
                x = x.transpose(1, 2)
                x = F.layer_norm(
                    x, (dim,), T_(s[f"{base}.2.1.weight"]),
                    T_(s[f"{base}.2.1.bias"]),
                )
                x = x.transpose(1, 2)
            x = F.gelu(x)
        x = x.transpose(1, 2)
        stages["conv_features"] = x.numpy()

        last = cfg.conv_layers[-1][0]
        x = F.layer_norm(x, (last,), T_(s["layer_norm.weight"]),
                         T_(s["layer_norm.bias"]))
        x = F.linear(x, T_(s["post_extract_proj.weight"]),
                     T_(s["post_extract_proj.bias"]))
        stages["projected"] = x.numpy()

        if "encoder.pos_conv.0.weight_g" in s:
            pw = fold_weight_norm(
                s["encoder.pos_conv.0.weight_g"], s["encoder.pos_conv.0.weight_v"]
            )
        else:
            pw = s["encoder.pos_conv.0.weight"]
        pc = F.conv1d(
            x.transpose(1, 2), T_(pw), T_(s["encoder.pos_conv.0.bias"]),
            padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups,
        )
        if cfg.conv_pos % 2 == 0:
            pc = pc[:, :, :-1]
        x = x + F.gelu(pc).transpose(1, 2)
        stages["pos_embedded"] = x.numpy()

        C, H = cfg.embed_dim, cfg.num_heads
        Dh = C // H
        B, T, _ = x.shape
        for i in range(cfg.encoder_layers):
            p = f"encoder.layers.{i}."
            residual = x
            h = F.layer_norm(
                x, (C,), T_(s[p + "self_attn_layer_norm.weight"]),
                T_(s[p + "self_attn_layer_norm.bias"]),
            )
            q = F.linear(h, T_(s[p + "self_attn.q_proj.weight"]),
                         T_(s[p + "self_attn.q_proj.bias"])) * Dh ** -0.5
            k = F.linear(h, T_(s[p + "self_attn.k_proj.weight"]),
                         T_(s[p + "self_attn.k_proj.bias"]))
            v = F.linear(h, T_(s[p + "self_attn.v_proj.weight"]),
                         T_(s[p + "self_attn.v_proj.bias"]))
            q = q.view(B, T, H, Dh)
            k = k.view(B, T, H, Dh)
            v = v.view(B, T, H, Dh)
            attn = torch.einsum("bthd,bshd->bhts", q, k).softmax(-1)
            ctx = torch.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
            x = residual + F.linear(ctx, T_(s[p + "self_attn.out_proj.weight"]),
                                    T_(s[p + "self_attn.out_proj.bias"]))
            residual = x
            h = F.layer_norm(x, (C,), T_(s[p + "final_layer_norm.weight"]),
                             T_(s[p + "final_layer_norm.bias"]))
            h = F.gelu(F.linear(h, T_(s[p + "fc1.weight"]), T_(s[p + "fc1.bias"])))
            x = residual + F.linear(h, T_(s[p + "fc2.weight"]),
                                    T_(s[p + "fc2.bias"]))
            stages[f"layer_{i}"] = x.numpy()

        x = F.layer_norm(x, (C,), T_(s["encoder.layer_norm.weight"]),
                         T_(s["encoder.layer_norm.bias"]))
        stages["final"] = x.numpy()

    if return_stages:
        return stages["final"], stages
    return stages["final"]


def make_sls_head_state(seed: int = 0, flat_dim: int = None,
                        embed_dim: int = 1024) -> Dict[str, np.ndarray]:
    """Random upstream-named SLS head state dict (fc0 / first_bn / fc1 /
    fc3, the parameter names of the upstream SLS checkpoint whose remnant
    is reference model_backup.py:186-201).

    ``flat_dim`` is floor(T/3) * floor(C/3) (22847 at the production
    T=201, C=1024 shape).
    """
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.2):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    return {
        "fc0.weight": w(1, embed_dim),
        "fc0.bias": w(1),
        "first_bn.weight": 1.0 + w(1, scale=0.05),
        "first_bn.bias": w(1, scale=0.05),
        "first_bn.running_mean": w(1, scale=0.1),
        "first_bn.running_var": 1.0 + np.abs(w(1, scale=0.1)),
        "first_bn.num_batches_tracked": np.asarray(0, np.int64),
        "fc1.weight": w(1024, flat_dim, scale=0.02),
        "fc1.bias": w(1024, scale=0.02),
        "fc3.weight": w(2, 1024, scale=0.1),
        "fc3.bias": w(2, scale=0.1),
    }


def torch_sls_forward(
    enc_state: Dict[str, np.ndarray],
    head_state: Dict[str, np.ndarray],
    cfg: XLSRConfig,
    wav: np.ndarray,
) -> np.ndarray:
    """Torch-functional forward of the full upstream XLS-R+SLS model
    (eval mode, running BatchNorm stats): getAttenF -> fc0/sigmoid ->
    gate-weighted layer sum -> BatchNorm2d(1) -> SELU -> max_pool2d(3,3)
    -> flatten -> fc1 -> SELU -> fc3 -> SELU -> log_softmax.

    Reference semantics: model_backup.py:183-201 (getAttenF + the
    double-forward layer_results fetch) and the upstream SLS repo's
    Model.forward.  layer_results = per-layer outputs pre-final-LN
    (wav2vec/wav2vec2.py:939-960).
    """
    import torch
    import torch.nn.functional as F

    T_ = torch.from_numpy

    _, stages = torch_reference_forward(enc_state, cfg, wav, return_stages=True)
    layer_results = [
        T_(stages[f"layer_{i}"]) for i in range(cfg.encoder_layers)
    ]  # each [B, T, C]

    with torch.no_grad():
        # getAttenF: gates from per-layer time pooling
        pooled = torch.stack([lr.mean(dim=1) for lr in layer_results], dim=1)
        # pooled: [B, L, C]
        y0 = torch.sigmoid(
            F.linear(pooled, T_(head_state["fc0.weight"]),
                     T_(head_state["fc0.bias"]))
        )  # [B, L, 1]
        full = torch.stack(layer_results, dim=1)  # [B, L, T, C]
        fused = (full * y0[..., None]).sum(dim=1)  # [B, T, C]

        x = fused.unsqueeze(1)  # [B, 1, T, C]
        x = F.batch_norm(
            x,
            T_(head_state["first_bn.running_mean"]),
            T_(head_state["first_bn.running_var"]),
            T_(head_state["first_bn.weight"]),
            T_(head_state["first_bn.bias"]),
            training=False, eps=1e-5,
        )
        x = F.selu(x)
        x = F.max_pool2d(x, (3, 3))
        x = torch.flatten(x, 1)
        x = F.linear(x, T_(head_state["fc1.weight"]), T_(head_state["fc1.bias"]))
        x = F.selu(x)
        x = F.linear(x, T_(head_state["fc3.weight"]), T_(head_state["fc3.bias"]))
        x = F.selu(x)
        return F.log_softmax(x, dim=1).numpy()


def make_detector_state(
    cfg: XLSRConfig,
    dict_size: int = 4096,
    k: int = 128,
    classifier_hidden: int = 256,
    use_sparse_features: bool = True,
    seed: int = 0,
    weight_scale: float = 0.2,
) -> Dict[str, np.ndarray]:
    """Random full-detector state dict with REFERENCE checkpoint naming
    (the 'model' entry of main.py:753-764 dict checkpoints):
    ``ssl_model.model.*`` fairseq encoder + ``sae.*`` AutoEncoderTopK
    (model.py:42-104) + ``classifier.{0,1,4}.*`` Sequential
    (model.py:183-189).  Consumable by convert.detector_state_to_flax
    and by torch_detector_forward below."""
    rng = np.random.default_rng(seed + 1)
    D = cfg.embed_dim

    enc = make_fairseq_state(cfg, seed=seed, weight_scale=weight_scale)
    s = {f"ssl_model.model.{key}": v for key, v in enc.items()}

    # reference SAE init: unit-norm decoder atoms, tied encoder
    # (model.py:56-66); random directions here — it's a golden harness
    w_dec = rng.normal(size=(D, dict_size)).astype(np.float32)
    w_dec /= np.linalg.norm(w_dec, axis=0, keepdims=True)  # [D, M]
    s["sae.decoder.weight"] = w_dec  # torch Linear(M, D): [D, M]
    s["sae.encoder.weight"] = w_dec.T.copy()  # Linear(D, M): [M, D]
    s["sae.encoder.bias"] = (
        rng.normal(size=dict_size) * 0.02).astype(np.float32)
    s["sae.b_dec"] = (rng.normal(size=D) * 0.02).astype(np.float32)
    s["sae.k"] = np.asarray(k, np.int64)

    cls_in = dict_size if use_sparse_features else D
    s["classifier.0.weight"] = (
        1.0 + rng.normal(size=cls_in) * 0.05).astype(np.float32)
    s["classifier.0.bias"] = (
        rng.normal(size=cls_in) * 0.05).astype(np.float32)
    s["classifier.1.weight"] = (
        rng.normal(size=(classifier_hidden, cls_in))
        / np.sqrt(cls_in)).astype(np.float32)
    s["classifier.1.bias"] = (
        rng.normal(size=classifier_hidden) * 0.02).astype(np.float32)
    s["classifier.4.weight"] = (
        rng.normal(size=(2, classifier_hidden))
        / np.sqrt(classifier_hidden)).astype(np.float32)
    s["classifier.4.bias"] = (rng.normal(size=2) * 0.02).astype(np.float32)
    return s


def _np_topk_mask(scores: np.ndarray, k: int) -> np.ndarray:
    idx = np.argsort(-scores, axis=-1, kind="stable")[..., :k]
    mask = np.zeros_like(scores)
    np.put_along_axis(mask, idx, 1.0, axis=-1)
    return mask


def _np_sae_sparsify(
    acts: np.ndarray, k: int, variant: str, window_size: int
) -> np.ndarray:
    """Reference TopK rules in loop form (model.py:73-77,
    model_window_topk.py:118-203, model_cpc.py:118-164)."""
    if variant == "per_timestep":
        return acts * _np_topk_mask(acts, k)
    B, T, Dm = acts.shape
    w = window_size
    if variant == "window_hard":
        pad = (w - T % w) % w
        xp = np.pad(acts, ((0, 0), (0, pad), (0, 0)))
        out = np.zeros_like(xp)
        for i in range((T + pad) // w):
            seg = xp[:, i * w:(i + 1) * w]
            mask = _np_topk_mask(seg.sum(axis=1), k)
            out[:, i * w:(i + 1) * w] = seg * mask[:, None, :]
        return out[:, :T]
    if variant == "window_overlap":
        s = max(1, w // 2)
        if s >= T:
            nw, pad = 1, max(0, w - T)
        else:
            nw = (T - w) // s + 1
            pad = max(0, (nw - 1) * s + w - T)
        xp = np.pad(acts, ((0, 0), (0, pad), (0, 0)))
        votes = np.zeros_like(xp)
        for i in range(nw):
            seg = xp[:, i * s:i * s + w]
            mask = _np_topk_mask(seg.sum(axis=1), k)
            votes[:, i * s:i * s + w] += seg * mask[:, None, :]
        out = xp * _np_topk_mask(votes, k)
        return out[:, :T]
    raise ValueError(variant)


def torch_detector_forward(
    s: Dict[str, np.ndarray],
    cfg: XLSRConfig,
    wav: np.ndarray,
    use_sparse_features: bool = True,
    variant: str = "per_timestep",
    window_size: int = 8,
    return_stages: bool = False,
):
    """Torch/numpy-functional forward of the COMPLETE reference detector
    (eval mode, dropout off): encoder -> centered SAE encode + TopK rule
    -> decode -> mean-pool classifier -> log_softmax
    (reference: model.py:195-260 forward, model.py:68-89 SAE,
    model.py:182-189 classifier ordering).

    Returns (log_probs [B,2], stages dict) when ``return_stages``; the
    stages include codes/recon/sae_loss for elementwise goldens."""
    import torch
    import torch.nn.functional as F

    T_ = torch.from_numpy

    enc_state = {
        key[len("ssl_model.model."):]: v
        for key, v in s.items() if key.startswith("ssl_model.model.")
    }
    feats = torch_reference_forward(enc_state, cfg, wav)  # [B, T, C] np
    k = int(np.asarray(s["sae.k"]))

    with torch.no_grad():
        x = T_(feats)
        centered = x - T_(s["sae.b_dec"])
        acts = F.relu(
            F.linear(centered, T_(s["sae.encoder.weight"]),
                     T_(s["sae.encoder.bias"]))
        ).numpy()
        codes = _np_sae_sparsify(acts, k, variant, window_size)
        recon = F.linear(
            T_(codes), T_(s["sae.decoder.weight"])
        ) + T_(s["sae.b_dec"])
        sae_loss = F.mse_loss(recon, x)  # model.py:225

        cls_in = T_(codes) if use_sparse_features else recon
        pooled = cls_in.mean(dim=1)  # AdaptiveAvgPool1d(1)
        h = F.layer_norm(
            pooled, (pooled.shape[-1],),
            T_(s["classifier.0.weight"]), T_(s["classifier.0.bias"]),
        )
        h = F.relu(F.linear(h, T_(s["classifier.1.weight"]),
                            T_(s["classifier.1.bias"])))
        logits = F.linear(h, T_(s["classifier.4.weight"]),
                          T_(s["classifier.4.bias"]))
        log_probs = F.log_softmax(logits, dim=1).numpy()

    if return_stages:
        return log_probs, {
            "features": feats,
            "codes": codes,
            "recon": recon.numpy(),
            "sae_loss": float(sae_loss),
            "score": np.exp(log_probs[:, 1]),
        }
    return log_probs
