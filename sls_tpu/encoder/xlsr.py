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
from sls_tpu.kernels.frontend import (
    choose_tile,
    fp32_layer_norm,
    frontend_tail_fused,
    tail_lengths,
)


def _seq_shard(x: jnp.ndarray, cfg: XLSRConfig) -> jnp.ndarray:
    """Pin the frame axis of a [B, T, C] activation to ``cfg.seq_axis``.

    Batch and channel dims stay UNCONSTRAINED so the same annotation
    composes with a data-parallel batch sharding (dp x sp meshes).
    Requires an ambient mesh (``jax.sharding.set_mesh``) at trace time —
    parallel/sequence.py arranges that.  No-op when seq_axis is unset.
    """
    if not cfg.seq_axis:
        return x
    from jax.sharding import PartitionSpec as P

    spec = P(P.UNCONSTRAINED, cfg.seq_axis, P.UNCONSTRAINED)
    return jax.lax.with_sharding_constraint(x, spec)


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


class _ScaleBias(nn.Module):
    """Declares norm affine params with nn.LayerNorm/GroupNorm's names,
    shapes, and init — and returns their VALUES, so the fused Pallas
    front-end can consume them while checkpoints keep the same layout."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _NormParams(nn.Module):
    """Scope shim reproducing ``Fp32LayerNorm(name=...)`` param paths
    (``norm_i/LayerNorm_0/{scale,bias}``) without computing anything."""

    dim: int
    inner: str  # "LayerNorm_0" | "GroupNorm_0"

    @nn.compact
    def __call__(self):
        return _ScaleBias(self.dim, name=self.inner)()


class _ConvParams(nn.Module):
    """Declares nn.Conv-compatible params (same names, shapes, lecun
    init) and returns their values for the functional conv paths."""

    kernel_size: int
    in_ch: int
    out_ch: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_ch, self.out_ch),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


def _conv1d(h, kernel, bias, stride, dtype):
    """nn.Conv-equivalent VALID 1-D conv (inputs/params cast to dtype)."""
    out = jax.lax.conv_general_dilated(
        h.astype(dtype),
        kernel.astype(dtype),
        (stride,),
        "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def _fp32_group_norm_per_channel(x, scale, bias, eps=1e-5):
    """fairseq Fp32GroupNorm with num_groups == num_channels on [B,T,C]:
    per-(batch, channel) instance norm over time, fast-variance form."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


class ConvFeatureExtractor(nn.Module):
    """7-layer strided 1-D conv waveform front-end.

    [B, samples] -> [B, T, C]; total stride 320 (20 ms hop @ 16 kHz).
    Reference: wav2vec/wav2vec2.py:773-851 (ConvFeatureExtractionModel).
    Norm mode: 'layer_norm' (XLS-R) normalizes after every conv; 'default'
    group-norms only the first layer.

    Two compute paths over ONE param layout:
    - XLA path (training + fallback): per-layer ``lax.conv`` + fp32
      norm + GELU.  Layer 0 stays on lax.conv in both paths — phase-GEMM
      reformulations measured SLOWER there (L0 4.7 -> 7.4 ms; the
      [B,2T,C]->[B,T,2C] reshape is a real HBM relayout,
      docs/BENCH_NOTES_r1.json / _r2 negative_results).
    - fused Pallas path (``config.fused_frontend``, eval only): layers
      1..L-1 plus every LN+GELU run in VMEM via
      kernels/frontend.frontend_tail_fused, skipping the inter-layer
      HBM round-trips.  Measured SLOWER than XLA on v5e (34.8 vs
      19.8 ms at B=128) — kept off by default; see
      docs/BENCH_NOTES_r2.json negative_results.
    """

    config: XLSRConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        kernels, conv_biases, norm_scales, norm_biases = [], [], [], []
        in_ch = 1
        for i, (dim, kernel, stride) in enumerate(cfg.conv_layers):
            kern, cbias = _ConvParams(
                kernel, in_ch, dim, cfg.conv_bias, name=f"conv_{i}"
            )()
            kernels.append(kern)
            conv_biases.append(cbias)
            if cfg.extractor_mode == "layer_norm":
                sc, bi = _NormParams(dim, "LayerNorm_0", name=f"norm_{i}")()
            elif cfg.extractor_mode == "default" and i == 0:
                sc, bi = _NormParams(dim, "GroupNorm_0", name=f"norm_{i}")()
            else:
                sc = bi = None
            norm_scales.append(sc)
            norm_biases.append(bi)
            in_ch = dim

        h = wav[:, :, None].astype(cfg.dtype)  # [B, samples, 1]
        if self._fused_ok(train, wav.shape[1]):
            dims = [d for d, _, _ in cfg.conv_layers]
            specs = tuple((k, s) for _, k, s in cfg.conv_layers[1:])
            h = _conv1d(
                h, kernels[0], conv_biases[0], cfg.conv_layers[0][2], cfg.dtype
            )
            bias_stack = (
                jnp.stack(conv_biases[1:])
                if cfg.conv_bias
                else jnp.zeros((len(specs), dims[0]), jnp.float32)
            )
            return frontend_tail_fused(
                h,
                tuple(kernels[1:]),
                bias_stack,
                jnp.stack(norm_scales),
                jnp.stack(norm_biases),
                specs=specs,
                approx_gelu=cfg.use_approx_gelu,
                out_dtype=cfg.dtype,
                interpret=jax.default_backend() != "tpu",
            )

        for i, (dim, kernel, stride) in enumerate(cfg.conv_layers):
            h = _conv1d(h, kernels[i], conv_biases[i], stride, cfg.dtype)
            if cfg.extractor_mode == "layer_norm":
                y = fp32_layer_norm(
                    h.astype(jnp.float32), norm_scales[i], norm_biases[i], 1e-5
                )
                h = y.astype(cfg.dtype)
            elif cfg.extractor_mode == "default" and i == 0:
                h = _fp32_group_norm_per_channel(h, norm_scales[i], norm_biases[i])
            h = jax.nn.gelu(
                h.astype(jnp.float32), approximate=cfg.use_approx_gelu
            ).astype(cfg.dtype)
        return h

    def _fused_ok(self, train: bool, num_samples: int) -> bool:
        cfg = self.config
        if not cfg.fused_frontend or train or cfg.extractor_mode != "layer_norm":
            return False
        dims = [d for d, _, _ in cfg.conv_layers]
        if len(set(dims)) != 1 or len(cfg.conv_layers) < 2:
            return False
        specs = tuple((k, s) for _, k, s in cfg.conv_layers[1:])
        d0, k0, s0 = cfg.conv_layers[0]
        n0 = (num_samples - k0) // s0 + 1
        t_out = tail_lengths(n0, specs)[-1]
        return (
            choose_tile(
                t_out, n0, specs, d0, itemsize=jnp.dtype(cfg.dtype).itemsize
            )
            is not None
        )


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
        if cfg.grouped_conv_einsum:
            h = self._einsum_grouped(x)
        else:
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

    def _einsum_grouped(self, x: jnp.ndarray) -> jnp.ndarray:
        """Grouped conv as a scan of per-tap block-diagonal einsums.

        Same math and the SAME param layout (``conv/kernel`` shaped
        [K, C/G, C], ``conv/bias``) as the nn.Conv path — used under
        tensor-parallel meshes because XLA's SPMD partitioner
        mis-scales grouped-convolution WEIGHT gradients by the size of
        an unused mesh axis (jax 0.9.0; minimal repro in
        tests/test_tensor_parallel.py).  Einsum contractions partition
        correctly.
        """
        cfg = self.config
        K, G, C = cfg.conv_pos, cfg.conv_pos_groups, cfg.embed_dim
        cg = C // G
        kernel, bias = _ConvParams(K, cg, C, True, name="conv")()
        B, T = x.shape[0], x.shape[1]
        xp = jnp.pad(
            x.astype(cfg.dtype), ((0, 0), (K // 2, K - 1 - K // 2), (0, 0))
        )
        wg = kernel.reshape(K, cg, G, cg).astype(cfg.dtype)

        def body(acc, wk_k):
            wk, k = wk_k
            xs = jax.lax.dynamic_slice_in_dim(xp, k, T, axis=1)
            xs = xs.reshape(B, T, G, cg)
            return acc + jnp.einsum("btgc,cgo->btgo", xs, wk), None

        acc0 = jnp.zeros((B, T, G, cg), cfg.dtype)
        acc, _ = jax.lax.scan(body, acc0, (wg, jnp.arange(K)))
        return acc.reshape(B, T, C) + bias.astype(cfg.dtype)


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
            if cfg.int8_serving and cfg.int8_scope == "all":
                from sls_tpu.quant.int8 import QuantizableDense

                # int8 only when no gradients are live; the param tree
                # is identical to nn.Dense either way (quant/int8.py)
                return QuantizableDense(
                    C, dtype=cfg.dtype, use_int8=deterministic, name=name
                )
            return nn.Dense(
                C, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
            )

        q = proj("q_proj")(x).reshape(B, T, H, D)
        k = proj("k_proj")(x).reshape(B, T, H, D)
        v = proj("v_proj")(x).reshape(B, T, H, D)

        if (cfg.flash_long_t and deterministic and cfg.seq_axis
                and T >= cfg.flash_long_t):
            # sequence-parallel long-T eval: Q stays on its frame shard,
            # K/V all-gather over ICI, per-shard VMEM flash kernel via
            # shard_map (kernels/flash_attention.py) — the one Pallas
            # kernel that matters in exactly the regime SP targets, so
            # it does NOT follow the bypass-all-Pallas SP rule.
            from sls_tpu.kernels.flash_attention import (
                sp_block_q,
                sp_flash_attention_long,
            )

            mesh = jax.sharding.get_abstract_mesh()
            n_seq = dict(mesh.shape).get(cfg.seq_axis, 0) if mesh else 0
            n_data = dict(mesh.shape).get("data", 1) if mesh else 1
            if (n_seq and T % n_seq == 0 and sp_block_q(T // n_seq)
                    and B % max(n_data, 1) == 0):
                ctx = sp_flash_attention_long(
                    (q * (D ** -0.5)).reshape(B, T, C),
                    k.reshape(B, T, C),
                    v.reshape(B, T, C),
                    num_heads=H,
                    seq_axis=cfg.seq_axis,
                    data_axis="data" if "data" in dict(mesh.shape) else None,
                    interpret=jax.default_backend() != "tpu",
                )
                return proj("out_proj")(ctx)
            # ragged shard / indivisible layout: XLA attention below
            # (GSPMD inserts the K/V gathers itself)

        if (cfg.flash_long_t and deterministic and not cfg.seq_axis
                and T >= cfg.flash_long_t and T % 256 == 0):
            # long-T eval (un-windowed full utterances): the [B,H,T,T]
            # fp32 scores would be HBM-resident under XLA (1 GB/layer
            # at T=4032, B=1); this kernel keeps each score strip in
            # VMEM (kernels/flash_attention.py).
            from sls_tpu.kernels.flash_attention import flash_attention_long

            ctx = flash_attention_long(
                (q * (D ** -0.5)).reshape(B, T, C),
                k.reshape(B, T, C),
                v.reshape(B, T, C),
                num_heads=H,
                interpret=jax.default_backend() != "tpu",
            )
            return proj("out_proj")(ctx)

        if cfg.fused_attention and deterministic and not cfg.seq_axis:
            # VMEM-resident attention (kernels/attention.py): no HBM
            # round-trips for the [B,H,T,T] scores.  Eval-only (no
            # custom VJP); training keeps the XLA path below.
            from sls_tpu.kernels.attention import fused_attention

            ctx = fused_attention(
                q * (D ** -0.5), k, v,
                interpret=jax.default_backend() != "tpu",
            ).reshape(B, T, C)
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

        if cfg.int8_serving:
            from sls_tpu.quant.int8 import QuantizableDense

            def dense(features, name):
                return QuantizableDense(
                    features, dtype=cfg.dtype, use_int8=deterministic,
                    name=name,
                )
        else:
            def dense(features, name):
                return nn.Dense(
                    features, dtype=cfg.dtype, param_dtype=jnp.float32,
                    name=name,
                )

        def ffn(h):
            h = dense(cfg.ffn_dim, "fc1")(h)
            h = act(h.astype(jnp.float32)).astype(cfg.dtype)
            h = act_drop(h, deterministic=deterministic)
            h = dense(cfg.embed_dim, "fc2")(h)
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
        # sequence parallelism starts here: the O(T) front-end above ran
        # unsharded; the O(T^2) layer stack below is pinned to the seq
        # mesh axis (re-annotated per layer so GSPMD never drifts back)
        x = _seq_shard(x, cfg)

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
            x = _seq_shard(x, cfg)
            if return_hidden_states:
                hidden_states.append(x)

        if cfg.layer_norm_first:
            x = Fp32LayerNorm(name="encoder_layer_norm")(x)

        if return_hidden_states:
            return x, hidden_states
        return x
