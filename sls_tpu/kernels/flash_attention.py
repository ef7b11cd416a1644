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

    q: [B, Tq, C] and k, v: [B, Tkv, C] projection outputs (q pre-scaled
    by Dh^-0.5), C = num_heads * Dh.  Returns [B, Tq, C] in q's dtype.
    Tq must be a multiple of ``block_q`` (the long-T eval path pads
    utterances to length buckets, so this holds by construction; the
    sequence-parallel wrapper below picks block_q to divide its local
    shard).  Tq == Tkv for plain self-attention; under sequence
    parallelism q is the local frame shard while k/v are the gathered
    full sequence.
    """
    B, Tq, C = q.shape
    Tkv = k.shape[1]
    Dh = C // num_heads
    if Tq % block_q:
        raise ValueError(f"Tq={Tq} not a multiple of block_q={block_q}")

    def to_bh(x):
        t = x.shape[1]
        return (
            x.reshape(B, t, num_heads, Dh)
            .transpose(0, 2, 1, 3)
            .reshape(B * num_heads, t, Dh)
        )

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    grid = (B * num_heads, Tq // block_q)

    out = pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tkv, Dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tkv, Dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * num_heads, Tq, Dh), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    return (
        out.reshape(B, num_heads, Tq, Dh)
        .transpose(0, 2, 1, 3)
        .reshape(B, Tq, C)
    )


def sp_block_q(t_local: int, preferred: int = 256, minimum: int = 128):
    """Largest q-block <= ``preferred`` dividing the local shard length,
    or None when the shard is too ragged for an efficient kernel."""
    b = preferred
    while b >= minimum:
        if t_local % b == 0:
            return b
        b //= 2
    return None


def sp_flash_attention_long(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    seq_axis: str,
    data_axis: str = "data",
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel flash attention: Q stays local, K/V all-gather.

    Under sequence parallelism the frame axis of q/k/v is sharded over
    ``seq_axis`` (parallel/sequence.py).  Attention needs every key and
    value against each local query block, so each shard all-gathers K/V
    over ICI (2·T·C·2B bytes — at T=5120, C=1024 that is 20 MB, amortized
    over the layer's 4·T_loc·T·C score/context FLOPs) and runs the VMEM
    flash kernel on its local Q strip: the [B, H, T_loc, T] fp32 scores
    never touch HBM, same memory behavior as the single-device kernel.

    q, k, v: GLOBAL [B, T, C] views (q pre-scaled), sharded
    [data_axis, seq_axis, -] by the encoder's sharding constraints.
    Requires the ambient mesh (jax.sharding.set_mesh) that the SP
    recipe already establishes.  Returns the global [B, T, C] view with
    the same layout.
    """
    spec = jax.sharding.PartitionSpec(data_axis, seq_axis, None)

    def local(q_l, k_l, v_l):
        kg = jax.lax.all_gather(k_l, seq_axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(v_l, seq_axis, axis=1, tiled=True)
        bq = sp_block_q(q_l.shape[1], preferred=block_q)
        if bq is None:
            # the encoder call site gates on sp_block_q and falls back
            # to XLA attention for ragged shards (encoder/xlsr.py);
            # a direct caller must get a clear error, not the
            # "int % NoneType" TypeError from inside shard_map tracing
            raise ValueError(
                f"local shard length {q_l.shape[1]} has no q-block "
                f">=128 dividing it — pad T to a multiple of "
                f"128*n_seq_shards or use XLA attention for this shape")
        return flash_attention_long(
            q_l, kg, vg, num_heads=num_heads, block_q=bq,
            interpret=interpret,
        )

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the vma checker rejects inside shard_map
    return jax.shard_map(
        local, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


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
