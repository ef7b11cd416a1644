"""TopK sparsification rules as pure, jit-friendly functions.

The three sparsity rules of the reference SAE family, re-derived for TPU:

- ``topk_per_row``: per-frame TopK (reference: model.py:68-79)
- ``window_topk_overlap``: 50%-overlap windows with vote merging
  (reference: model_window_topk.py:118-203)
- ``window_topk_hard``: non-overlapping windows
  (reference: model_cpc.py:118-164)

TPU design notes:

The reference materializes TopK with ``topk`` + in-place ``scatter_``.
XLA scatters serialize badly on TPU, so we use the *threshold* form
instead: take the k-th largest value per row from ``lax.top_k`` and keep
every activation >= that threshold.  Because activations are multiplied by
the resulting {0,1} mask, entries that are exactly 0 contribute nothing
either way, and the two forms agree everywhere except on exact positive
ties at the k-th value (measure-zero for post-matmul floats; on a tie this
keeps all tied entries rather than an index-ordered subset).

The reference's overlap-vote merge loops over windows and timesteps in
Python with in-place scatter-adds.  Here the vote accumulation collapses
to one static binary coverage matrix ``C[i, t]`` (window i covers frame t)
and a single matmul:

    votes[b, t, d] = x[b, t, d] * sum_i C[i, t] * mask[b, i, d]

(the reference's per-window vote at frame t is exactly ``x[t] * mask[i]``),
which is MXU work instead of a scatter chain.

Known intentional delta: with the reference's window-count arithmetic,
trailing frames not covered by any window (e.g. frame 201 of 201 when
w=8, stride=4 covers frames [0, 200)) receive zero votes; torch's topk
then selects k *arbitrary* zero-vote features and leaks those raw
activations through.  We zero uncovered frames instead (documented,
cleaner, and covered by tests that exclude the uncovered tail when
comparing against reference semantics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _monotone_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Map float32 to uint32 preserving order (IEEE-754 radix trick)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    sign = (u >> 31) == 1
    return jnp.where(sign, ~u, u | jnp.uint32(0x80000000))


def kth_value_threshold(acts: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th largest value along the last axis WITHOUT sorting.

    32-step binary search on the order-preserving bit pattern — each step
    is one vectorized compare+reduce, so cost is O(32*n) elementwise work
    instead of an O(n log n) sort.  Measured on v5e at [12864, 4096]:
    ~29 ms for sort-based ``lax.top_k`` vs a few ms for this form (and
    ~2 ms fully fused in the Pallas SAE kernel).
    Returns threshold values with shape acts.shape[:-1] + (1,).
    """
    bits = _monotone_bits(acts)
    shape = acts.shape[:-1] + (1,)
    lo = jnp.zeros(shape, jnp.uint32)
    hi = jnp.full(shape, jnp.uint32(0xFFFFFFFF))

    def body(_, carry):
        lo, hi = carry
        mid = lo + ((hi - lo) >> 1)
        count = (bits >= mid).sum(axis=-1, keepdims=True)
        keep = count >= k
        return jnp.where(keep, mid, lo), jnp.where(keep, hi, mid)

    lo, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
    # invert the monotone mapping: threshold bits -> float
    sign = (lo & jnp.uint32(0x80000000)) == 0
    raw = jnp.where(sign, ~lo, lo & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(raw, jnp.float32)


def topk_mask(acts: jnp.ndarray, k: int) -> jnp.ndarray:
    """{0,1} mask keeping the k largest entries of the last axis.

    Threshold form: everything >= the k-th largest value is kept (ties at
    the threshold keep all tied entries).  The threshold comes from the
    sort-free binary search above (float32 inputs; other dtypes fall back
    to ``lax.top_k``).
    """
    if acts.dtype == jnp.float32:
        # stop_gradient: the threshold is a constant w.r.t. autodiff,
        # exactly like torch.topk's indices (and bitcast has no grad rule)
        kth = jax.lax.stop_gradient(kth_value_threshold(acts, k))
    else:
        kth = jax.lax.top_k(acts, k)[0][..., -1:]
    return (acts >= kth).astype(acts.dtype)


def topk_per_row(acts: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-row TopK sparsification: keep k largest, zero the rest."""
    return acts * topk_mask(acts, k)


def topk_per_row_exact(acts: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact scatter form (always exactly k survivors, index-ordered tie
    break like torch.topk).  Slower on TPU; used for parity testing."""
    vals, idx = jax.lax.top_k(acts, k)
    out = jnp.zeros_like(acts)
    return jnp.put_along_axis(out, idx, vals, axis=-1, inplace=False)


def _overlap_geometry(T: int, window: int) -> Tuple[int, int, int, int]:
    """(stride, num_windows, pad, T_padded) for the 50%-overlap scheme,
    replicating the reference's arithmetic (model_window_topk.py:131-151).

    Degenerate branch (T < window): the reference keeps the sequence
    unpadded, which makes its unfold() produce ZERO windows (crash or
    empty output — for window//2 < T < window the floor-divided window
    count is 0 and every frame would get zero votes); we pad up to one
    full window instead — a strict fix covering the whole short range."""
    stride = max(1, window // 2)
    if T < window:
        return stride, 1, window - T, window
    num_windows = (T - window) // stride + 1
    required = (num_windows - 1) * stride + window
    pad = max(0, required - T)
    return stride, num_windows, pad, T + pad


@functools.lru_cache(maxsize=64)
def _coverage_matrix(T_padded: int, window: int, stride: int, num_windows: int):
    """Static binary coverage matrix C[i, t] = window i covers frame t.

    Returns NUMPY (not jnp): a cached jnp array created under one trace
    would leak that trace's tracer into later jit calls; the numpy
    constant is embedded per-trace by jnp.asarray at the use site."""
    cov = np.zeros((num_windows, T_padded), dtype=np.float32)
    for i in range(num_windows):
        cov[i, i * stride : i * stride + window] = 1.0
    return cov


def window_topk_overlap(acts: jnp.ndarray, k: int, window: int) -> jnp.ndarray:
    """Overlap-window TopK with vote merging.

    acts: [B, T, D] post-ReLU activations.  Windows of ``window`` frames at
    50% overlap each select their top-k features by within-window summed
    activation; overlapping selections are merged by activation-weighted
    voting and a second per-frame top-k over the votes.
    """
    B, T, D = acts.shape
    stride, num_windows, pad, T_padded = _overlap_geometry(T, window)
    x = jnp.pad(acts, ((0, 0), (0, pad), (0, 0))) if pad else acts

    # Per-window feature scores: summed activation over the window.
    # reduce_window implements the strided sliding sum without gathers.
    # stop_gradient is BOTH required and correct here: (a) semantics —
    # window_sums only feeds the top-k selection mask, which is
    # piecewise-constant w.r.t. the activations exactly like the
    # reference's torch.topk indices (model_window_topk.py:118-203:
    # gradients flow through `acts * mask`, never through the index
    # computation); (b) jax 0.9.0 cannot linearize reduce_window under
    # jit(grad) ("Linearization failed to produce known values"), while
    # the primal-only path compiles fine — regression-tested by
    # tests/test_detector_train.py window-variant training.
    # (stop_gradient on the INPUT, not the output: jax's linearizer
    # still visits the primitive when its operand carries a tangent,
    # even into a stop_gradient — only a tangent-free operand skips it)
    window_sums = jax.lax.reduce_window(
        jax.lax.stop_gradient(x),
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )  # [B, num_windows, D]

    win_mask = topk_mask(window_sums, k)  # [B, nw, D]

    # votes[b,t,d] = x[b,t,d] * (number of covering windows that selected d)
    # The coverage contraction is the variant's FLOPs hotspot
    # (B*D x nw x T ~ 0.5 TFLOP at B=64); run it in bf16 — masks are {0,1}
    # and counts are tiny integers, exactly representable — accumulate fp32.
    cov = jnp.asarray(_coverage_matrix(T_padded, window, stride, num_windows))
    cover_count = jnp.einsum(
        "it,bid->btd",
        cov.astype(jnp.bfloat16),
        win_mask.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    votes = x * cover_count

    # Per-frame top-k over vote strength; frames with no positive votes
    # (uncovered tail) are zeroed — see module docstring.  Sort-free
    # threshold (32x compare+reduce beats the sort at D=4096).
    kth = jax.lax.stop_gradient(kth_value_threshold(votes, k))
    frame_mask = ((votes >= kth) & (votes > 0)).astype(x.dtype)
    out = x * frame_mask
    return out[:, :T, :] if pad else out


def window_topk_hard(acts: jnp.ndarray, k: int, window: int) -> jnp.ndarray:
    """Non-overlapping window TopK: one feature set per window, broadcast
    to every frame in the window (reference: model_cpc.py:118-164)."""
    B, T, D = acts.shape
    pad = (window - T % window) % window
    x = jnp.pad(acts, ((0, 0), (0, pad), (0, 0))) if pad else acts
    T_padded = T + pad
    num_windows = T_padded // window

    x_win = x.reshape(B, num_windows, window, D)
    window_sums = x_win.sum(axis=2)
    win_mask = topk_mask(window_sums, k)  # [B, nw, D]
    out = (x_win * win_mask[:, :, None, :]).reshape(B, T_padded, D)
    return out[:, :T, :] if pad else out


def aggregate_windows_mean(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Mean-pool frames into non-overlapping windows: [B,T,D] -> [B,N,D]
    (reference: model_cpc.py:445-471; zero-pads the tail window)."""
    B, T, D = x.shape
    pad = (window - T % window) % window
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x.reshape(B, (T + pad) // window, window, D).mean(axis=2)
