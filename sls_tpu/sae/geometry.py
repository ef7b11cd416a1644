"""Geometric utilities for SAE initialization.

``geometric_median`` re-implements the IRLS (Weiszfeld) routine the
reference defines for decoder-bias initialization (reference:
model.py:24-40, duplicated in every model file; never actually invoked by
the live training path).  Provided here both for completeness and because
median-initializing ``b_dec`` from a feature sample is genuinely useful
when training SAEs from scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def geometric_median(
    points: jnp.ndarray, max_iter: int = 100, tol: float = 1e-5
) -> jnp.ndarray:
    """Weiszfeld iteration for the geometric median of [N, D] points.

    Fixed-iteration lax.while_loop with a tolerance-based early exit —
    jit-friendly, unlike the reference's Python loop."""
    points = jnp.asarray(points, jnp.float32)

    def cond(state):
        i, guess, prev = state
        return (i < max_iter) & (jnp.linalg.norm(guess - prev) >= tol)

    def body(state):
        i, guess, _ = state
        dists = jnp.linalg.norm(points - guess, axis=1)
        weights = 1.0 / jnp.maximum(dists, 1e-12)
        weights = weights / weights.sum()
        new_guess = (weights[:, None] * points).sum(axis=0)
        return i + 1, new_guess, guess

    init = points.mean(axis=0)
    _, guess, _ = jax.lax.while_loop(
        cond, body, (0, init, jnp.full_like(init, jnp.inf))
    )
    return guess
