"""Long-sequence attention kernel: scores never touch HBM.

Motivation (reference: wav2vec2.py:1009 MultiheadAttention): the
windowed eval paths keep T at 201 where XLA's fused attention wins
(see kernels/attention.py measurements).  UN-windowed full-utterance
scoring — In-the-Wild clips run to minutes — needs T in the thousands,
where XLA materializes the [B, H, T, T] fp32 score tensor in HBM
several times per layer (T=4032: 1.0 GB per layer at B=1, H=16).

At XLS-R's head dim (64) the entire K and V for one (batch, head) fit
comfortably in VMEM even at T=16k (2 x T x 64 x 2B = 4 MB), so no
online-softmax streaming is required: each grid cell owns one q block,
computes its [BLOCK_Q, T] score strip in VMEM fp32, softmaxes, and
contracts with V — one HBM read per operand, one write of the output.
This is flash attention's memory behavior with a simpler single-pass
softmax (valid because the strip fits on chip; a streaming variant
only becomes necessary past T ~ 8k at BLOCK_Q 256 fp32).

Correctness is pinned by tests/test_flash_attention.py (interpret-mode
elementwise vs the jnp reference); speed measurements live in
docs/BENCH_NOTES_r3.json (long_t_attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, o_ref):
    """One q block vs the full K/V of its (batch*head).

    q_ref: [1, BQ, Dh]; k_ref/v_ref: [1, T, Dh]; o_ref: [1, BQ, Dh].
    """
    q = q_ref[0]  # [BQ, Dh]
    k = k_ref[0]  # [T, Dh]
    v = v_ref[0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [BQ, T]
    probs = jax.nn.softmax(scores, axis=-1)  # fp32, VMEM-resident
    o_ref[0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "interpret")
)
def flash_attention_long(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q @ k^T) @ v per head without materializing scores in HBM.

    q, k, v: [B, T, C] projection outputs (q pre-scaled by Dh^-0.5),
    C = num_heads * Dh.  Returns [B, T, C] in q's dtype.  T must be a
    multiple of ``block_q`` (the long-T eval path pads utterances to
    length buckets, so this holds by construction).
    """
    B, T, C = q.shape
    Dh = C // num_heads
    if T % block_q:
        raise ValueError(f"T={T} not a multiple of block_q={block_q}")

    def to_bh(x):
        return (
            x.reshape(B, T, num_heads, Dh)
            .transpose(0, 2, 1, 3)
            .reshape(B * num_heads, T, Dh)
        )

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    grid = (B * num_heads, T // block_q)

    out = pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * num_heads, T, Dh), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    return (
        out.reshape(B, num_heads, T, Dh)
        .transpose(0, 2, 1, 3)
        .reshape(B, T, C)
    )


def attention_reference(q, k, v, num_heads):
    """jnp reference with the same [B, T, C] contract (fp32 softmax)."""
    B, T, C = q.shape
    Dh = C // num_heads
    qh = q.reshape(B, T, num_heads, Dh)
    kh = k.reshape(B, T, num_heads, Dh)
    vh = v.reshape(B, T, num_heads, Dh)
    scores = jnp.einsum("bthd,bshd->bhts", qh, kh).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhts,bshd->bthd", probs.astype(vh.dtype), vh)
    return ctx.reshape(B, T, C)
