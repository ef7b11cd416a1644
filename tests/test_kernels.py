"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.kernels.sae_kernels import sae_decode_fused, sae_encode_fused


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(0)
    D, M = 128, 512
    return {
        "x": rng.normal(size=(300, D)).astype(np.float32),  # N not tile-aligned
        "w_enc": rng.normal(size=(D, M)).astype(np.float32) * 0.05,
        "b_enc": rng.normal(size=(M,)).astype(np.float32) * 0.1,
        "w_dec": rng.normal(size=(M, D)).astype(np.float32) * 0.05,
        "b_dec": rng.normal(size=(D,)).astype(np.float32) * 0.1,
    }


def test_encode_fused_matches_reference(weights):
    w = weights
    ref = np.maximum((w["x"] - w["b_dec"]) @ w["w_enc"] + w["b_enc"], 0.0)
    out = np.asarray(
        sae_encode_fused(
            jnp.asarray(w["x"]), jnp.asarray(w["w_enc"]),
            jnp.asarray(w["b_enc"]), jnp.asarray(w["b_dec"]),
            tile_n=128, tile_m=256, interpret=True,
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_decode_fused_matches_reference(weights):
    w = weights
    rng = np.random.default_rng(1)
    codes = np.maximum(rng.normal(size=(300, 512)), 0).astype(np.float32)
    ref = codes @ w["w_dec"] + w["b_dec"]
    out = np.asarray(
        sae_decode_fused(
            jnp.asarray(codes), jnp.asarray(w["w_dec"]),
            jnp.asarray(w["b_dec"]), tile_n=128, tile_k=256, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_encode_small_n(weights):
    """N smaller than one tile: padding path."""
    w = weights
    x = w["x"][:3]
    ref = np.maximum((x - w["b_dec"]) @ w["w_enc"] + w["b_enc"], 0.0)
    out = np.asarray(
        sae_encode_fused(
            jnp.asarray(x), jnp.asarray(w["w_enc"]), jnp.asarray(w["b_enc"]),
            jnp.asarray(w["b_dec"]), tile_n=128, tile_m=256, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
