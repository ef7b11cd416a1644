"""Pallas TPU kernels for the SAE hot path.

The SAE encode is the hottest non-encoder op (reference scatter chain:
model.py:68-79 runs topk+scatter over [B*T, 4096] every step).  The fused
kernels here keep the whole centered-matmul + bias + ReLU epilogue in
VMEM — one HBM round-trip for the [N, dict_size] activations instead of
three (matmul out, bias add, relu):

- ``sae_encode_fused``: relu((x - b_dec) @ W_enc + b_enc)
- ``sae_decode_fused``: codes @ W_dec + b_dec

Tiling: grid over (N/TN, M/TM) output tiles; the contraction dim D
(1024) rides whole in VMEM (x tile TNxD ~1 MB + W tile DxTM ~2 MB fp32,
comfortably under the ~16 MB/core budget).  fp32 accumulation via
``preferred_element_type``; N is padded to the tile size in the wrapper
and sliced back.

TopK sparsification stays on ``jax.lax.top_k`` (XLA's sort-based top-k
over 4096 lanes is already near-roofline; an in-kernel bisection top-k
would trade exactness for nothing measurable at k=128).

Use ``interpret=True`` on CPU (tests); compiled path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _encode_kernel(x_ref, w_ref, b_enc_ref, b_dec_ref, out_ref):
    centered = x_ref[:] - b_dec_ref[:]  # [TN, D] - [1, D]
    acc = jnp.dot(centered, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.maximum(acc + b_enc_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def sae_encode_fused(
    x: jnp.ndarray,
    w_enc: jnp.ndarray,
    b_enc: jnp.ndarray,
    b_dec: jnp.ndarray,
    tile_n: int = 256,
    tile_m: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu((x - b_dec) @ w_enc + b_enc) for x [N, D] -> [N, M]."""
    n, d = x.shape
    m = w_enc.shape[1]
    tile_m = min(tile_m, m)
    n_pad = _round_up(max(n, 1), tile_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        _encode_kernel,
        grid=(n_pad // tile_n, m // tile_m),
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), w_enc.astype(jnp.float32),
      b_enc.reshape(1, -1).astype(jnp.float32),
      b_dec.reshape(1, -1).astype(jnp.float32))
    return out[:n]


def _decode_kernel(c_ref, w_ref, b_dec_ref, out_ref):
    acc = jnp.dot(c_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc + b_dec_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k", "interpret"))
def sae_decode_fused(
    codes: jnp.ndarray,
    w_dec: jnp.ndarray,
    b_dec: jnp.ndarray,
    tile_n: int = 256,
    tile_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """codes @ w_dec + b_dec for codes [N, M] -> [N, D].

    The contraction dim M (4096) is looped via the grid's innermost axis
    with an accumulating output block.
    """
    n, m = codes.shape
    d = w_dec.shape[1]
    tile_k = min(tile_k, m)
    n_pad = _round_up(max(n, 1), tile_n)
    if n_pad != n:
        codes = jnp.pad(codes, ((0, n_pad - n), (0, 0)))

    grid_k = m // tile_k

    def kernel(c_ref, w_ref, b_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.broadcast_to(b_ref[:], out_ref.shape)

        out_ref[:] += jnp.dot(c_ref[:], w_ref[:],
                              preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile_n, grid_k),
        in_specs=[
            pl.BlockSpec((tile_n, tile_k), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, d), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
    )(codes.astype(jnp.float32), w_dec.astype(jnp.float32),
      b_dec.reshape(1, -1).astype(jnp.float32))
    return out[:n]
