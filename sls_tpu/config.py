"""Typed configuration tree for the whole framework.

Replaces the reference's scattered argparse flags (reference:
main.py:402-461, train_cpc.py:430-502) and run-name-as-config idiom with
serializable dataclasses that are stored inside checkpoints and run dirs
(reference stored raw ``args`` dicts in checkpoints, main.py:763).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class XLSRConfig:
    """wav2vec2 / XLS-R encoder hyperparameters.

    Defaults describe XLS-R-300M as loaded by the reference
    (reference: wav2vec/wav2vec2.py:40-252 dataclass; 24 layers, embed 1024,
    16 heads, FFN 4096, layer-norm extractor mode, pre-LN blocks).
    """

    # conv feature extractor: (channels, kernel, stride) per layer;
    # total stride 320 -> 64600 samples => 201 frames
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    extractor_mode: str = "layer_norm"  # "default" (group-norm 1st) | "layer_norm"
    conv_bias: bool = True

    encoder_layers: int = 24
    embed_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    activation: str = "gelu"
    layer_norm_first: bool = True

    conv_pos: int = 128  # positional conv kernel
    conv_pos_groups: int = 16

    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    layerdrop: float = 0.0

    # compute dtype for matmul-heavy ops; norms/softmax stay fp32
    dtype: Any = jnp.bfloat16
    # rematerialize transformer layers (trade FLOPs for HBM at big batches)
    remat: bool = False
    # fused VMEM attention kernel (eval path; falls back to XLA when
    # training so autodiff works)
    fused_attention: bool = False
    # int8 dynamic-quantized serving: run matmuls int8 on the MXU with
    # per-token/per-channel scales; eval only — training always keeps
    # the bf16/fp32 recipe.  Param tree is unchanged (quant/int8.py),
    # so any checkpoint serves either way.
    int8_serving: bool = False
    # which matmuls the int8 path covers.  "ffn" (fc1/fc2 only — the
    # wide 1024x4096 GEMMs) measured 1.14x end-to-end on the flagship
    # (970.9 vs 848.8 utts/s at b36) and is the default; "all" (+QKVO)
    # measured 0.94x — the narrow 1024x1024 projections pay more in
    # quantize/rescale passes than the 1.73x MXU rate returns
    # (docs/BENCH_NOTES_r3.json int8_serving).
    int8_scope: str = "ffn"
    # long-sequence attention: when T >= this and T is block-aligned,
    # eval attention routes through kernels/flash_attention.py (scores
    # stay in VMEM; XLA would spill [B,H,T,T] fp32 to HBM).  0 = off.
    # 2048 = measured v5e crossover (BENCH_NOTES_r3 long_t: flash is
    # 0.90x at T=1280, 1.09x at 2560, 1.42x at 5120).
    flash_long_t: int = 2048
    # pos_conv as per-tap einsums instead of grouped nn.Conv: required
    # under tensor-parallel meshes (XLA SPMD mis-scales grouped-conv
    # weight grads by an unused mesh-axis size, jax 0.9.0 — repro in
    # tests/test_tensor_parallel.py); auto-enabled by the Trainer when
    # model_parallel > 1
    grouped_conv_einsum: bool = False
    # fused conv front-end tail (kernels/frontend.py): LN+GELU chain and
    # conv layers 1..L-1 in one Pallas kernel, eval path only; falls
    # back to the XLA conv path when training / infeasible tiling.
    # Default OFF: measured SLOWER than XLA on v5e (34.8 vs 19.8 ms at
    # B=128 — XLA's conv+LN+GELU tail already runs ~65% MFU, near the
    # ~13 ms bf16 speed-of-light; the phase-GEMM decomposition
    # underfills the MXU). Kept as a tested experimental path; see
    # docs/BENCH_NOTES_r2.json negative_results.
    fused_frontend: bool = False
    # tanh-approx GELU: max-abs error ~3e-3 vs exact erf — below the
    # bf16 pipeline's own round-off (~1.5% at the final features,
    # docs/PARITY_FULL_TOPOLOGY.json) and ~1.7x cheaper on the VPU
    # (measured 15.6 -> 9.2 ms on the layer-0-sized activation).
    # None = resolve by dtype: approximate iff dtype is bfloat16, so the
    # fp32 golden-parity path always uses the exact erf form.
    approx_gelu: Optional[bool] = None
    # sequence-parallel axis name: when set, the encoder pins the frame
    # (time) axis of every transformer-layer activation to this mesh
    # axis via sharding constraints, so ONE long utterance spreads over
    # multiple chips (LN/FFN shard trivially; GSPMD all-gathers K/V per
    # attention layer over ICI).  The un-windowed full-utterance scorer
    # (evaluation/overlap.py) is the intended consumer — at T in the
    # thousands attention dominates, so only the O(T) conv front-end
    # runs replicated.  Pallas kernels (flash/fused attention, SAE)
    # don't shard transparently and are bypassed when this is set —
    # parallel/sequence.py applies the full recipe.  None = off.
    seq_axis: Optional[str] = None

    def __post_init__(self):
        # programmatic construction bypasses the CLI's choices= guard,
        # and an unknown scope would silently behave as "ffn" (only the
        # attention layer checks == "all") — reject it here instead
        if self.int8_scope not in ("ffn", "all"):
            raise ValueError(
                f"int8_scope must be 'ffn' or 'all', got "
                f"{self.int8_scope!r}"
            )

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def use_approx_gelu(self) -> bool:
        if self.approx_gelu is None:
            return self.dtype == jnp.bfloat16
        return self.approx_gelu

    def num_frames(self, num_samples: int) -> int:
        """Output frame count of the conv front-end for a waveform length."""
        t = num_samples
        for _, k, s in self.conv_layers:
            t = (t - k) // s + 1
        return t


def tiny_xlsr_config(**overrides) -> XLSRConfig:
    """Small config for tests / CPU dry-runs (same topology, tiny dims)."""
    base = dict(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        extractor_mode="layer_norm",
        conv_bias=True,
        encoder_layers=2,
        embed_dim=64,
        ffn_dim=128,
        num_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        dtype=jnp.float32,
    )
    base.update(overrides)
    return XLSRConfig(**base)


@dataclass(frozen=True)
class SAEConfig:
    """TopK sparse autoencoder configuration.

    ``variant`` selects the sparsity rule (reference model files):
      - "per_timestep":   topk per frame            (model.py:68-79)
      - "window_overlap": 50%-overlap vote windows  (model_window_topk.py:118-203)
      - "window_hard":    non-overlapping windows   (model_cpc.py:118-164)
    """

    activation_dim: int = 1024
    dict_size: int = 4096
    k: int = 128
    variant: str = "per_timestep"
    window_size: int = 8  # used by window variants
    use_pallas: bool = False  # fused VMEM encode/decode kernels (TPU only)
    bf16: bool = False  # bf16 enc/dec matmuls + topk (fp32 codes/losses)


@dataclass(frozen=True)
class CPCConfig:
    """Contrastive-predictive-coding head (reference: model_cpc.py:288-528)."""

    hidden_dim: int = 256
    prediction_steps: Tuple[int, ...] = (1, 2, 4)
    temperature: float = 0.07


@dataclass(frozen=True)
class ModelConfig:
    """Full detector: encoder + (optional) SAE + classifier head."""

    encoder: XLSRConfig = field(default_factory=XLSRConfig)
    # stop-gradient the SSL features: the legacy ModelSAE trains only the
    # SAE + head on a frozen encoder (reference: model_backup.py:358-359)
    freeze_encoder: bool = False
    use_sae: bool = True
    use_sparse_features: bool = True  # classify on 4096-d codes vs 1024-d recon
    sae: SAEConfig = field(default_factory=SAEConfig)
    use_cpc: bool = False
    cpc: CPCConfig = field(default_factory=CPCConfig)
    classifier_hidden: int = 256
    classifier_dropout: float = 0.3
    num_classes: int = 2

    @property
    def classifier_input_dim(self) -> int:
        if self.use_sae and self.use_sparse_features:
            return self.sae.dict_size
        return self.encoder.embed_dim


@dataclass(frozen=True)
class RawBoostConfig:
    """RawBoost augmentation parameters (reference: main.py:443-459 defaults).

    ``algo`` composes the three primitives:
      1=LnL convolutive, 2=ISD impulsive, 3=SSI colored additive,
      4=1+2+3, 5=1+2, 6=1+3, 7=2+3, 8=1||2 parallel, 0/other=off.
    """

    algo: int = 3
    # convolutive (LnL) / FIR-notch parameters
    nBands: int = 5
    minF: int = 20
    maxF: int = 8000
    minBW: int = 100
    maxBW: int = 1000
    minCoeff: int = 10
    maxCoeff: int = 100
    minG: int = 0
    maxG: int = 0
    minBiasLinNonLin: int = 5
    maxBiasLinNonLin: int = 20
    N_f: int = 5
    # impulsive (ISD)
    P: int = 10
    g_sd: int = 2
    # colored additive (SSI)
    SNRmin: int = 10
    SNRmax: int = 40


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference defaults: main.py:404-420)."""

    batch_size: int = 14
    num_epochs: int = 100
    lr: float = 1e-6
    weight_decay: float = 1e-4
    # weighted NLL: [spoof, bonafide]; bonafide is the 2019-LA minority class
    loss_weights: Tuple[float, float] = (0.1, 0.9)
    sae_weight: float = 0.1
    cpc_weight: float = 0.5
    seed: int = 1234
    cut_length: int = 64600
    # tensor-parallel degree: shards the wide dims (FFN 4096, SAE dict)
    # over a 2-D ('data','model') mesh (parallel/tensor.py).  1 = pure
    # DP, the fast layout for the 300M flagship; >1 is the scale-out
    # axis for wider models.  use_pallas SAE must be off when > 1.
    model_parallel: int = 1
    rawboost: RawBoostConfig = field(default_factory=RawBoostConfig)


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    track: str = "LA"  # LA | DF | In-the-Wild
    comment: Optional[str] = None

    def model_tag(self) -> str:
        """Run-directory name encoding the experiment, mirroring the
        reference's tag scheme (reference: main.py:473-476)."""
        if not self.model.use_sae:
            tag = (
                f"sls_{self.track}_e{self.train.num_epochs}"
                f"_bs{self.train.batch_size}_lr{self.train.lr}"
            )
            if self.comment:
                tag += f"_{self.comment}"
            return tag
        variant = {
            "per_timestep": "pt",
            "window_overlap": "win",
            "window_hard": "hardwin",
        }[self.model.sae.variant]
        tag = (
            f"topk_sae_{variant}_{self.track}_e{self.train.num_epochs}"
            f"_bs{self.train.batch_size}_lr{self.train.lr}"
            f"_saeW{self.train.sae_weight}_dict{self.model.sae.dict_size}"
            f"_k{self.model.sae.k}"
        )
        if self.model.sae.variant != "per_timestep":
            tag += f"_w{self.model.sae.window_size}"
        if self.model.use_cpc:
            tag += f"_cpc{self.train.cpc_weight}"
        if self.comment:
            tag += f"_{self.comment}"
        return tag


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if obj is jnp.bfloat16 or obj is jnp.float32 or hasattr(obj, "dtype") or (
        isinstance(obj, type) and hasattr(obj, "__name__")
    ):
        return getattr(obj, "__name__", str(obj))
    return obj


def config_to_json(cfg: Any) -> str:
    """Serialize any config dataclass to JSON (stored in checkpoints)."""
    return json.dumps(_to_jsonable(cfg), indent=2, default=str)


_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}


def config_from_dict(cls, d: Dict[str, Any]):
    """Rebuild a config dataclass from a JSON dict (inverse of
    config_to_json for the dataclasses in this module)."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = config_from_dict(f.type, v)
        elif f.name == "dtype":
            kwargs[f.name] = _DTYPES.get(v, jnp.float32)
        elif f.name == "conv_layers":
            kwargs[f.name] = tuple(tuple(layer) for layer in v)
        elif f.name in ("prediction_steps", "loss_weights"):
            kwargs[f.name] = tuple(v)
        elif f.name in ("encoder", "sae", "cpc", "model", "train", "rawboost"):
            sub_cls = {
                "encoder": XLSRConfig,
                "sae": SAEConfig,
                "cpc": CPCConfig,
                "model": ModelConfig,
                "train": TrainConfig,
                "rawboost": RawBoostConfig,
            }[f.name]
            kwargs[f.name] = config_from_dict(sub_cls, v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
