"""Long-T attention kernel: interpret-mode elementwise equivalence vs
the jnp reference at several (T, block_q) shapes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sls_tpu.kernels.flash_attention import (  # noqa: E402
    attention_reference,
    flash_attention_long,
)


def _qkv(B, T, C, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(0, 0.5, (B, T, C)).astype(dtype))
    return mk(), mk(), mk()


@pytest.mark.parametrize("T,block_q", [(256, 128), (512, 256), (1024, 256)])
def test_matches_reference(T, block_q):
    B, H, C = 2, 4, 128
    q, k, v = _qkv(B, T, C)
    got = flash_attention_long(q, k, v, num_heads=H, block_q=block_q,
                               interpret=True)
    want = attention_reference(q, k, v, num_heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_bf16_inputs_fp32_softmax():
    B, H, C, T = 1, 4, 128, 256
    q, k, v = _qkv(B, T, C, seed=3, dtype=np.float32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention_long(qb, kb, vb, num_heads=H, block_q=128,
                               interpret=True)
    want = attention_reference(qb.astype(jnp.float32),
                               kb.astype(jnp.float32),
                               vb.astype(jnp.float32), num_heads=H)
    assert got.dtype == jnp.bfloat16
    rel = float(jnp.abs(got.astype(jnp.float32) - want).max()
                / jnp.abs(want).mean())
    assert rel < 0.1  # bf16 operand rounding only; softmax stays fp32


def test_rejects_ragged_t():
    q, k, v = _qkv(1, 200, 64)
    with pytest.raises(ValueError, match="not a multiple"):
        flash_attention_long(q, k, v, num_heads=2, block_q=128,
                             interpret=True)


def test_encoder_long_t_route_matches_xla():
    """XLSREncoder output is identical whether attention goes through
    the long-T VMEM kernel (flash_long_t) or the XLA einsum path."""
    import dataclasses

    from sls_tpu.config import tiny_xlsr_config
    from sls_tpu.encoder.xlsr import XLSREncoder
    from sls_tpu.evaluation.overlap import length_buckets

    base = tiny_xlsr_config(flash_long_t=0)
    wav_len = length_buckets(base, t_targets=(256,))[256]
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.1, (1, wav_len)).astype(np.float32))

    enc = XLSREncoder(base)
    params = enc.init(jax.random.PRNGKey(0), wav[:, :1000])["params"]
    xla_out = enc.apply({"params": params}, wav, train=False)

    flash_cfg = dataclasses.replace(base, flash_long_t=256)
    flash_out = XLSREncoder(flash_cfg).apply(
        {"params": params}, wav, train=False)
    np.testing.assert_allclose(
        np.asarray(flash_out), np.asarray(xla_out), rtol=0, atol=3e-5)
