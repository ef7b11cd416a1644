"""Flax XLS-R (wav2vec2) encoder, designed TPU-first.

Functionally equivalent to the fairseq wav2vec2 inference path
(reference: wav2vec/wav2vec2.py:540-647 ``features_only=True``) but written
for XLA/TPU from scratch:

- All inputs are fixed-length (64,600 samples -> 201 frames), so there is
  no padding mask anywhere and every shape is static.  The reference's
  ``pad_to_multiple(required_seq_len_multiple=2)`` dance
  (wav2vec2.py:922-932,966-970) is intentionally omitted: padded keys are
  masked out of attention and padded outputs discarded, so it is a no-op
  on results — on TPU it only costs an off-tile sequence length.
- Matmul-heavy ops run in ``config.dtype`` (bf16 by default) with fp32
  LayerNorm / softmax islands, matching fairseq's Fp32LayerNorm behavior.
- Dropout is OFF in eval.  (The reference keeps the SSL encoder in
  train() mode even under eval — model.py:128-133 — an acknowledged quirk
  we do not reproduce; XLS-R-300M ships with 0.0 dropout rates anyway.)
- NWC layouts throughout (channels-last feeds the MXU without transposes).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sls_tpu.config import XLSRConfig


class Fp32LayerNorm(nn.Module):
    """LayerNorm computed in fp32 regardless of the surrounding dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class Fp32GroupNorm(nn.Module):
    """Per-channel (instance) norm in fp32 — fairseq's Fp32GroupNorm with
    num_groups == num_channels, used by the 'default' extractor mode."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class ConvFeatureExtractor(nn.Module):
    """7-layer strided 1-D conv waveform front-end.

    [B, samples] -> [B, T, C]; total stride 320 (20 ms hop @ 16 kHz).
    Reference: wav2vec/wav2vec2.py:773-851 (ConvFeatureExtractionModel).
    Norm mode: 'layer_norm' (XLS-R) normalizes after every conv; 'default'
    group-norms only the first layer.

    Stays on ``lax.conv``: with correct (pipelined-dispatch) timing on
    v5e the conv stack is ~25-30 ms at B=128 and phase-GEMM
    reformulations measured SLOWER (L0 4.7 -> 7.4 ms, L1 9.3 -> 22.8 ms;
    the [B,2T,C]->[B,T,2C] reshape and strided tail slice are real HBM
    relayouts on TPU's tiled layout).  r1's im2col attempt lost for the
    same reason (docs/BENCH_NOTES_r1.json negative_results).
    """

    config: XLSRConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        h = wav[:, :, None].astype(cfg.dtype)  # [B, samples, 1]
        for i, (dim, kernel, stride) in enumerate(cfg.conv_layers):
            h = nn.Conv(
                features=dim,
                kernel_size=(kernel,),
                strides=(stride,),
                padding="VALID",
                use_bias=cfg.conv_bias,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(h)
            if cfg.extractor_mode == "layer_norm":
                h = Fp32LayerNorm(name=f"norm_{i}")(h)
            elif cfg.extractor_mode == "default" and i == 0:
                h = Fp32GroupNorm(num_groups=dim, name=f"norm_{i}")(h)
            h = jax.nn.gelu(
                h.astype(jnp.float32), approximate=cfg.use_approx_gelu
            ).astype(cfg.dtype)
        return h


class PositionalConv(nn.Module):
    """Grouped depth-preserving conv positional embedding.

    kernel 128, groups 16, SAME-style padding with the trailing element
    dropped for even kernels (fairseq SamePad), then GELU.
    Reference: wav2vec/wav2vec2.py:859-878.  The torch weight-norm
    parametrization is folded into a single kernel at conversion time.
    """

    config: XLSRConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        pad = cfg.conv_pos // 2
        h = nn.Conv(
            features=cfg.embed_dim,
            kernel_size=(cfg.conv_pos,),
            padding=[(pad, pad)],
            feature_group_count=cfg.conv_pos_groups,
            use_bias=True,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if cfg.conv_pos % 2 == 0:
            h = h[:, :-1, :]
        return jax.nn.gelu(
            h.astype(jnp.float32), approximate=cfg.use_approx_gelu
        ).astype(cfg.dtype)


class SelfAttention(nn.Module):
    """Multi-head self-attention with fp32 softmax.

    Equivalent to fairseq MultiheadAttention in the self-attention,
    no-padding configuration (reference: wav2vec/wav2vec2.py:1009-1016).
    Plain XLA einsum attention: at T~201 the full [B,H,T,T] score tensor is
    tiny (<3 MB/ head-batch), fuses well, and saturates the MXU — a Pallas
    flash kernel is only worthwhile for the long-sequence eval path.
    """

    config: XLSRConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        B, T, C = x.shape
        H, D = cfg.num_heads, cfg.head_dim

        def proj(name):
            return nn.Dense(
                C, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
            )

        q = proj("q_proj")(x).reshape(B, T, H, D)
        k = proj("k_proj")(x).reshape(B, T, H, D)
        v = proj("v_proj")(x).reshape(B, T, H, D)

        if cfg.fused_attention and deterministic:
            # VMEM-resident attention (kernels/attention.py): no HBM
            # round-trips for the [B,H,T,T] scores.  Eval-only (no
            # custom VJP); training keeps the XLA path below.
            from sls_tpu.kernels.attention import fused_attention

            ctx = fused_attention(q * (D ** -0.5), k, v).reshape(B, T, C)
            return proj("out_proj")(ctx)

        scores = jnp.einsum("bthd,bshd->bhts", q * (D ** -0.5), k)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        probs = nn.Dropout(rate=cfg.attention_dropout)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, C)
        return proj("out_proj")(ctx)


class TransformerLayer(nn.Module):
    """Pre-LN (XLS-R) or post-LN transformer block.

    Reference: wav2vec/wav2vec2.py:983-1083 (TransformerSentenceEncoderLayer).
    """

    config: XLSRConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        act = {"gelu": lambda h: jax.nn.gelu(h, approximate=cfg.use_approx_gelu),
               "relu": jax.nn.relu}[cfg.activation]

        attn_ln = Fp32LayerNorm(name="self_attn_layer_norm")
        final_ln = Fp32LayerNorm(name="final_layer_norm")
        drop = nn.Dropout(rate=cfg.dropout)
        act_drop = nn.Dropout(rate=cfg.activation_dropout)

        def ffn(h):
            h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, param_dtype=jnp.float32,
                         name="fc1")(h)
            h = act(h.astype(jnp.float32)).astype(cfg.dtype)
            h = act_drop(h, deterministic=deterministic)
            h = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, param_dtype=jnp.float32,
                         name="fc2")(h)
            return drop(h, deterministic=deterministic)

        attn = SelfAttention(cfg, name="self_attn")
        if cfg.layer_norm_first:
            x = x + drop(attn(attn_ln(x), deterministic), deterministic=deterministic)
            x = x + ffn(final_ln(x))
        else:
            x = attn_ln(x + drop(attn(x, deterministic), deterministic=deterministic))
            x = final_ln(x + ffn(x))
        return x


class XLSREncoder(nn.Module):
    """Full XLS-R feature extractor: waveform -> [B, T, embed_dim].

    Mirrors Wav2Vec2Model.forward(..., features_only=True)
    (reference: wav2vec/wav2vec2.py:540-647): conv features -> fp32
    LayerNorm -> linear projection to embed_dim -> conv positional
    embedding -> N transformer layers -> final LayerNorm (pre-LN mode).

    ``return_hidden_states=True`` additionally returns the per-layer
    outputs (pre-final-LN, as fairseq's ``layer_results``) for the SLS
    layer-stacking head and layer-wise analyses.
    """

    config: XLSRConfig

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,
        train: bool = False,
        return_hidden_states: bool = False,
    ):
        cfg = self.config
        deterministic = not train

        feats = ConvFeatureExtractor(cfg, name="feature_extractor")(wav, train)
        feats = Fp32LayerNorm(name="post_extract_norm")(feats)
        x = nn.Dense(
            cfg.embed_dim, dtype=cfg.dtype, param_dtype=jnp.float32,
            name="post_extract_proj",
        )(feats)
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)

        x = x + PositionalConv(cfg, name="pos_conv")(x)
        if not cfg.layer_norm_first:
            x = Fp32LayerNorm(name="encoder_layer_norm")(x)
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)

        hidden_states: List[jnp.ndarray] = []
        layer_cls = TransformerLayer
        if cfg.remat:
            layer_cls = nn.remat(TransformerLayer)
        for i in range(cfg.encoder_layers):
            layer = layer_cls(cfg, name=f"layer_{i}")
            if train and cfg.layerdrop > 0.0:
                # Compute the layer unconditionally and select — params must
                # exist on both paths, and a data-dependent skip would defeat
                # XLA's static schedule anyway.
                # Derived from the dropout stream: callers only supply a
                # "dropout" rng (train/steps.py), and flax's make_rng
                # already folds in a fresh count per call site.
                rng = self.make_rng("dropout")
                keep = jax.random.uniform(rng, ()) >= cfg.layerdrop
                x = jnp.where(keep, layer(x, deterministic), x)
            else:
                x = layer(x, deterministic)
            if return_hidden_states:
                hidden_states.append(x)

        if cfg.layer_norm_first:
            x = Fp32LayerNorm(name="encoder_layer_norm")(x)

        if return_hidden_states:
            return x, hidden_states
        return x
