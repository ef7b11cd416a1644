"""Fused self-attention Pallas kernel for short sequences.

The XLS-R encoder runs 24 MHSA layers at T=201: XLA's unfused path
materializes the [B, H, T, T] score tensor in HBM several times per layer
(QK^T out, softmax in/out, PV in — ~83 MB bf16 per layer at B=64).  At
this sequence length the whole per-(batch, head) attention fits in VMEM,
so one kernel computes scores + fp32 softmax + context without touching
HBM in between — "flash attention without the tiling", the appropriate
form when T*T is small (a streaming-softmax kernel only pays off for
long-sequence paths).

Layout: inputs reshaped to [B*H, T, Dh]; grid over B*H.

MEASURED (v5e-1, B=64, T=201, XLS-R-300M end-to-end): the fused kernel is
SLOWER than XLA's batched attention — 127.6 ms/batch vs 115.1 ms — because
per-(b,h) [201x64] matmuls underutilize the 128x128 MXU and the
[B,T,H,Dh]->[B*H,T,Dh] relayout costs HBM traffic that XLA's fusion
avoids.  The flag (XLSRConfig.fused_attention) therefore defaults OFF.

STATUS: negative-result record for the T~200 regime.  The long-sequence
regime these kernels once gestured at is now ACTUALLY served by
kernels/flash_attention.py (q-blocked, handles T in the thousands where
a whole [T, T] strip per grid cell would not fit), wired into the
encoder via XLSRConfig.flash_long_t and the --unwindowed eval path;
measurements in docs/BENCH_NOTES_r3.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_heads_kernel(h_blk, head_dim, q_ref, k_ref, v_ref, o_ref):
    """h_blk heads per grid cell; refs are [1, T, h_blk*head_dim] lane
    slices of the [B, T, C] projection outputs — no relayout."""
    q = q_ref[0]  # [T, h_blk*Dh]
    k = k_ref[0]
    v = v_ref[0]
    for i in range(h_blk):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        scores = jnp.dot(q[:, sl], k[:, sl].T,
                         preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)  # fp32 island, VMEM-only
        o_ref[0, :, sl] = jnp.dot(
            probs.astype(v.dtype), v[:, sl],
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "h_blk", "interpret"))
def fused_attention_heads(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    h_blk: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q_h @ k_h^T) @ v_h per head with fp32 softmax, VMEM-resident.

    q, k, v: [B, T, C] projection outputs (q pre-scaled by Dh^-0.5); the
    per-head split happens INSIDE the kernel as lane slices, so unlike the
    r1 per-(b,h) variant there is no [B,T,H,Dh] relayout on either side.
    With h_blk=2 and Dh=64 each grid cell owns a 128-lane slice — aligned
    to the vreg lane width.

    MEASURED (v5e-1, B=128, T=202, H=16, r2): SLOWER than XLA's in-model
    fused attention at every h_blk (284-677 ms vs the whole einsum path)
    — the [202, 64] per-head matmuls underfill the MXU and Mosaic
    serializes the head loop.  At T~200 the [B,H,T,T] score tensor is
    small enough that XLA's own fusion wins; this kernel remains for
    long-sequence paths (T >= ~1k) where score materialization dominates.
    NOT wired into the model; fused_attention (below) is the flag-gated
    variant.
    """
    B, T, C = q.shape
    Dh = C // num_heads
    assert num_heads % h_blk == 0, (num_heads, h_blk)
    lanes = h_blk * Dh

    out = pl.pallas_call(
        functools.partial(_attn_heads_kernel, h_blk, Dh),
        grid=(B, num_heads // h_blk),
        in_specs=[
            pl.BlockSpec((1, T, lanes), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, lanes), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, lanes), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, lanes), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [T, Dh]
    k = k_ref[0]
    v = v_ref[0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)  # fp32 island
    ctx = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q @ k^T) @ v with fp32 softmax, fused per (batch, head).

    q, k, v: [B, T, H, Dh] (q already scaled by Dh^-0.5).
    Returns [B, T, H, Dh] in q's dtype.
    """
    B, T, H, Dh = q.shape

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, T, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, Dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dh), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    return out.reshape(B, H, T, Dh).transpose(0, 2, 1, 3)
