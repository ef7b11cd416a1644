"""SLS (Sensitive Layer Selection) classification head.

The upstream XLS-R+SLS architecture behind the reference's headline
numbers (EER 1.92% 2021-DF / 2.87% 2021-LA, README.md:84-86).  The
reference repo keeps only a remnant (``getAttenF`` + the double-forward
``layer_results`` fetch, model_backup.py:183-201); this is a complete
TPU-native implementation of the full upstream chain:

    getAttenF: per-layer time-pool -> fc0 -> sigmoid gates;
    gate-weighted sum over layers -> [B, T, C] -> unsqueeze channel ->
    BatchNorm2d(1) -> SELU -> max_pool2d(3,3) -> flatten ->
    fc1 -> SELU -> fc3 -> SELU -> log_softmax

Differences from the remnant's execution (not semantics):
- the encoder is run ONCE with ``return_hidden_states=True`` (the remnant
  called the 300M encoder twice per step to get layer_results)
- the per-layer Python loop over 24 tensors becomes one einsum
- submodule names (fc0 / first_bn / fc1 / fc3) match the upstream torch
  checkpoint so migration is mechanical (see encoder/convert.py
  sls_detector_state_to_flax)
"""

from __future__ import annotations

from typing import Any, List, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


class SLSHead(nn.Module):
    hidden_dim: int = 1024
    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: Union[jnp.ndarray, List[jnp.ndarray]],
        train: bool = False,
    ):
        """hidden_states: per-layer encoder outputs (fairseq
        layer_results: per-layer, pre-final-LN), either stacked
        [L, B, T, C] or as the raw list of L [B, T, C] arrays
        -> log-probabilities [B, num_classes].

        The two input forms are the same math.  The list form is the
        fast path: the per-layer time-pooled means fuse into the
        producing encoder layers for free, so only the gated-sum
        einsum reads the layer outputs again (measured on v5e at b36,
        bench_sls_compose.py / BENCH_NOTES_r4 sls_head_root_cause).
        """
        fc0 = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                       name="fc0")
        if isinstance(hidden_states, (list, tuple)):
            B, T, C = hidden_states[0].shape
            # getAttenF gates from PER-LAYER time-pooled means: a
            # tiny-output reduction fuses into its producing encoder
            # layer for free (measured: enc_livesum == enc_plain in
            # bench_sls_compose.py), unlike pooling the stack, which
            # re-reads all L x [B,T,C] from HBM.  A per-layer fp32
            # axpy accumulation was measured WORSE (+0.86 ms/layer:
            # the accumulator's HBM read-modify-write fuses into each
            # layer's LN fusion and de-tiles it) — one einsum over the
            # bf16 stack keeps the fp32 accumulation in VMEM instead.
            pooled = jnp.stack(
                [jnp.mean(h, axis=1, dtype=jnp.float32)
                 for h in hidden_states], axis=0)  # [L, B, C]
            gate = jax.nn.sigmoid(fc0(pooled))     # [L, B, 1]
            h = jnp.stack(hidden_states, axis=0)   # [L, B, T, C]
            fused = jnp.einsum(
                "lbtc,lb->btc", h, gate[..., 0].astype(h.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            h = hidden_states
            L, B, T, C = h.shape
            # getAttenF gates: adaptive_avg_pool1d over time -> fc0 ->
            # sigmoid (mean accumulates fp32; [L,B,C] pooled is tiny)
            pooled = jnp.mean(h, axis=2, dtype=jnp.float32)  # [L, B, C]
            gate = jax.nn.sigmoid(fc0(pooled))
            # sensitive-layer-weighted fusion: [B, T, C].  The stack
            # stays in the encoder dtype (an fp32 .astype here
            # materialized a 745 MB copy at b36) — the contraction
            # accumulates fp32.
            fused = jnp.einsum(
                "lbtc,lb->btc", h, gate[..., 0].astype(h.dtype),
                preferred_element_type=jnp.float32,
            )

        x = fused[..., None]  # [B, T, C, 1] — NHWC; torch is [B, 1, T, C]
        # BatchNorm2d(1): one mean/var over all (B, T, C) elements of the
        # single channel; torch momentum 0.1 == flax momentum 0.9
        x = nn.BatchNorm(
            use_running_average=not train, axis=-1, momentum=0.9,
            dtype=jnp.float32, param_dtype=jnp.float32, name="first_bn",
        )(x)
        x = jax.nn.selu(x)
        # max_pool2d(3, 3): window == stride, so VALID reduce_window is
        # exactly crop-to-multiple + reshape + max — 1.6x faster on v5e
        # than the reduce_window lowering (bench_sls_head.py maxpool_rw
        # vs maxpool_rs), bit-identical output
        T_, C_ = x.shape[1], x.shape[2]
        tp, cp = (T_ // 3) * 3, (C_ // 3) * 3
        x = x[:, :tp, :cp, 0].reshape(B, T_ // 3, 3, C_ // 3, 3)
        x = jnp.max(x, axis=(2, 4))
        # flatten: [B, T', C'] C-order == torch [B, 1, T', C'] flatten
        x = x.reshape(B, -1)

        # fc1 is the head's one wide GEMM ([B, T/3*C/3] @ [~23k, 1024])
        # and MUST run in the compute dtype on TPU: as an fp32 matmul
        # with a runtime weight it poisons the WHOLE program's schedule
        # (+21 ms/batch at b36 on v5e — the same program with the fp32
        # weight as a compile-time constant is fast, bench_sls_head.py
        # mlp_arg_* cases).  param_dtype stays fp32; fp32 configs
        # (tests/goldens) are unaffected since dtype is fp32 there.
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(
                         x.astype(self.dtype))
        x = jax.nn.selu(x.astype(jnp.float32))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc3")(x)
        # upstream applies SELU to the 2-class logits before log_softmax
        x = jax.nn.selu(x)
        return jax.nn.log_softmax(x, axis=-1)
