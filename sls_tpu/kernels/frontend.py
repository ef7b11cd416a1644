"""Fused conv front-end tail: LN0+GELU0 plus conv layers 1..L-1 in VMEM.

Layer 0 (the stride-5 kernel-10 waveform conv) stays on ``lax.conv``
where XLA already reaches ~140 TF/s; everything after it — the fp32
LayerNorm + GELU chain and the six stride-2 convs of XLS-R
(reference: wav2vec/wav2vec2.py:773-851 runs each conv/norm/GELU as a
separate CUDA op) — runs in ONE Pallas kernel that tiles the time axis
with halos, so no intermediate activation ever round-trips HBM.  On v5e
the inter-layer elementwise chain + HBM traffic was ~half the front-end
wall time (docs/BENCH_NOTES_r2.json component_ms).

Strided convs are phase-decomposed into dense matmuls because Mosaic has
no strided vector loads (``vector.extract_strided_slice`` only allows
stride 1): rows are pair-merged with a reshape ``[m*s, C] -> [m, s*C]``
so taps ``0..s-1`` become one ``[m, sC] x [sC, C]`` MXU dot, and each
tap ``j >= s`` is a contiguous lane-slice dot ``[m, C] x [C, C]`` — the
FLOP count is identical to the direct convolution.

Eval-path only (no custom VJP): training keeps the XLA conv path so
autodiff works; the fused kernel is numerically the same computation
with fp32 conv accumulation and fp32 norm islands.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Spec = Tuple[int, int]  # (kernel, stride) of one tail conv layer


def tail_lengths(n0: int, specs: Sequence[Spec]) -> List[int]:
    """Frame count at every level given n0 input frames (VALID convs)."""
    ns = [n0]
    for k, s in specs:
        ns.append((ns[-1] - k) // s + 1)
    return ns


def required_input(frames: int, specs: Sequence[Spec]) -> int:
    """Input frames needed at level 0 to produce `frames` final frames."""
    m = frames
    for k, s in reversed(list(specs)):
        m = (m - 1) * s + k
    return m


def choose_tile(
    t_out: int,
    n0: int,
    specs: Sequence[Spec],
    channels: int,
    itemsize: int = 2,
    target_bytes: int = 4 << 20,
    cap_bytes: int = 8 << 20,
) -> Optional[int]:
    """Frames-per-tile F (divisor of t_out), or None if tiling can't work.

    Tiling is feasible iff the conv_0 output covers every tile's halo:
    the last tile reads ``(t_out - F)*prod(strides) + required_input(F)``
    frames, which is independent of F.  Among feasible divisors we pick
    the one whose input-tile scratch is closest to `target_bytes` (big
    enough to amortize per-cell overhead, small enough to fit VMEM next
    to the resident weights).
    """
    total_stride = 1
    for _, s in specs:
        total_stride *= s
    best: Optional[Tuple[int, int]] = None
    for f in range(1, t_out + 1):
        if t_out % f:
            continue
        # Mosaic DMA slices must be 8-row aligned: tile starts are
        # multiples of f*total_stride, and the copy length is rounded up
        # to 8 — the last tile's rounded read must stay in bounds.
        if t_out != f and (f * total_stride) % 8:
            continue
        n_copy = -(-required_input(f, specs) // 8) * 8
        if (t_out - f) * total_stride + n_copy > n0:
            continue
        scratch = n_copy * channels * itemsize
        if scratch > cap_bytes:
            continue
        score = abs(scratch - target_bytes)
        if best is None or score < best[0]:
            best = (score, f)
    return None if best is None else best[1]


def fp32_layer_norm(xf: jnp.ndarray, scale, bias, eps: float) -> jnp.ndarray:
    """nn.LayerNorm fast-variance math over the trailing (channel) axis.

    Bit-matches flax ``nn.LayerNorm(use_fast_variance=True)`` on fp32
    input so the fused kernel and the XLA path share numerics.
    """
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


_fp32_ln = fp32_layer_norm


def _make_kernel(
    specs: Sequence[Spec],
    tile_lengths: List[int],
    f_tile: int,
    total_stride: int,
    channels: int,
    approx_gelu: bool,
    eps: float,
    compute_dtype,
    out_dtype,
):
    n_layers = len(specs)
    tail_taps = [(i, j) for i, (k, s) in enumerate(specs) for j in range(s, k)]
    tail_ix = {key: p for p, key in enumerate(tail_taps)}
    n_tails = len(tail_taps)
    c = channels
    n_copy = -(-tile_lengths[0] // 8) * 8  # 8-row-aligned DMA length

    def kernel(*args):
        h0 = args[0]
        wcats = args[1 : 1 + n_layers]
        wtails = args[1 + n_layers : 1 + n_layers + n_tails]
        bstk, lsc, lbs = args[1 + n_layers + n_tails : 4 + n_layers + n_tails]
        out_ref = args[4 + n_layers + n_tails]
        x_scr, sem = args[5 + n_layers + n_tails :]

        b = pl.program_id(0)
        t = pl.program_id(1)
        start = t * (f_tile * total_stride)
        cp = pltpu.make_async_copy(
            h0.at[b, pl.ds(start, n_copy), :], x_scr, sem
        )
        cp.start()
        cp.wait()

        h0_tile = x_scr[:][: tile_lengths[0]]
        hf = _fp32_ln(h0_tile.astype(jnp.float32), lsc[0], lbs[0], eps)
        h = jax.nn.gelu(hf, approximate=approx_gelu).astype(compute_dtype)
        for i, (k, s) in enumerate(specs):
            m = tile_lengths[i + 1]
            g0 = h[: m * s].reshape(m, s * c)
            acc = jnp.dot(g0, wcats[i][:], preferred_element_type=jnp.float32)
            if k > s:
                # taps j >= s read rows j+s*n; pad s-1 zero rows so the
                # last tap's pair-merge reshape has a full final group
                # (the padded lanes are sliced away before the dot)
                hp = h if s == 1 else jnp.concatenate(
                    [h, jnp.zeros((s - 1, c), h.dtype)], axis=0
                )
                for j in range(s, k):
                    if s == 1:
                        gj = hp[j : j + m]
                    else:
                        gj = hp[j : j + m * s].reshape(m, s * c)[:, :c]
                    acc = acc + jnp.dot(
                        gj,
                        wtails[tail_ix[(i, j)]][:],
                        preferred_element_type=jnp.float32,
                    )
            acc = acc + bstk[i]
            hf = _fp32_ln(acc, lsc[i + 1], lbs[i + 1], eps)
            h = jax.nn.gelu(hf, approximate=approx_gelu).astype(compute_dtype)
        out_ref[0, 0] = h.astype(out_dtype)

    return kernel, n_tails


@functools.partial(
    jax.jit,
    static_argnames=(
        "specs", "approx_gelu", "eps", "out_dtype", "frames_per_tile",
        "interpret",
    ),
)
def frontend_tail_fused(
    h0: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    bias_stack: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    *,
    specs: Tuple[Spec, ...],
    approx_gelu: bool,
    out_dtype=jnp.bfloat16,
    eps: float = 1e-5,
    frames_per_tile: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run LN0+GELU0 and conv layers 1..L-1 fused over `h0`.

    Args:
      h0: [B, N0, C] raw conv_0 output (bias applied, NO norm/act yet).
      weights: per tail layer i a [k_i, C, C] conv kernel, NWC/WIO layout.
      bias_stack: [L-1, C] fp32 conv biases for the tail layers (zeros
        when the config has no conv bias).
      ln_scale / ln_bias: [L, C] fp32 LayerNorm affine for layers 0..L-1.
      specs: ((k_i, s_i), ...) for tail layers; static.
      frames_per_tile: override the tile chooser (must divide T_out).

    Returns [B, T_out, C] in ``out_dtype``.
    """
    B, n0, c = h0.shape
    t_out = tail_lengths(n0, specs)[-1]
    f = frames_per_tile
    if f is None:
        f = choose_tile(t_out, n0, specs, c, itemsize=h0.dtype.itemsize)
    if f is None or t_out % f:
        raise ValueError(
            f"infeasible tiling: t_out={t_out} n0={n0} specs={specs} f={f}"
        )
    total_stride = 1
    for _, s in specs:
        total_stride *= s
    n_copy = -(-required_input(f, specs) // 8) * 8
    if (t_out - f) * total_stride + n_copy > n0:
        raise ValueError(
            f"aligned tile read out of bounds: f={f} n0={n0} specs={specs}"
        )
    # tile-local frame counts per level, outermost first
    tl = [f]
    for k, s in reversed(list(specs)):
        tl.append((tl[-1] - 1) * s + k)
    tile_lens = tl[::-1]

    compute_dtype = h0.dtype
    kernel, n_tails = _make_kernel(
        specs, tile_lens, f, total_stride, c, approx_gelu, eps,
        compute_dtype, out_dtype,
    )

    wcats = []
    wtails = []
    for i, (k, s) in enumerate(specs):
        w = weights[i].astype(compute_dtype)
        wcats.append(w[:s].reshape(s * c, c))
        for j in range(s, k):
            wtails.append(w[j])
    operands = [h0, *wcats, *wtails,
                bias_stack.astype(jnp.float32),
                ln_scale.astype(jnp.float32),
                ln_bias.astype(jnp.float32)]

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for arr in operands[1:]:
        in_specs.append(
            pl.BlockSpec(
                arr.shape,
                lambda b, t, nd=arr.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )

    nt = t_out // f
    # 4-D output so the block's trailing dims equal the array's (Mosaic
    # requires trailing block dims divisible by (8, 128) or full); the
    # reshape back to [B, T, C] is a free layout no-op for XLA
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, f, c), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt, f, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((n_copy, c), compute_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # weights stay VMEM-resident across the whole grid next to the
        # input tile + working activations; default 16M scoped limit is
        # too tight (v5e has 128M VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, t_out, c)
