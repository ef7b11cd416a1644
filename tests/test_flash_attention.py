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


@pytest.mark.parametrize("Tq,Tkv", [(128, 512), (256, 1024)])
def test_cross_length_matches_reference(Tq, Tkv):
    """Tq != Tkv (the sequence-parallel shape: local Q strip vs gathered
    full-sequence K/V) against a cross-attention jnp reference."""
    B, H, C = 2, 4, 128
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(0, 0.5, (B, Tq, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (B, Tkv, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, Tkv, C)).astype(np.float32))
    got = flash_attention_long(q, k, v, num_heads=H, block_q=128,
                               interpret=True)

    Dh = C // H
    qh = q.reshape(B, Tq, H, Dh)
    kh = k.reshape(B, Tkv, H, Dh)
    vh = v.reshape(B, Tkv, H, Dh)
    scores = jnp.einsum("bthd,bshd->bhts", qh, kh).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bhts,bshd->bthd", probs.astype(vh.dtype), vh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want.reshape(B, Tq, C)),
        rtol=0, atol=2e-5,
    )


def test_sp_block_q_selection():
    from sls_tpu.kernels.flash_attention import sp_block_q

    assert sp_block_q(1024) == 256
    assert sp_block_q(640) == 128   # 640 % 256 != 0, 640 % 128 == 0
    assert sp_block_q(384) == 128
    assert sp_block_q(200) is None  # too ragged for an efficient kernel


def test_sp_flash_matches_reference_on_mesh():
    """Sequence-parallel wrapper (Q local, K/V all-gather via shard_map)
    equals the single-device reference elementwise on a ('data','seq')
    mesh — the kernel the SP long-T path routes through."""
    from sls_tpu.kernels.flash_attention import sp_flash_attention_long
    from sls_tpu.parallel.sequence import sp_mesh

    B, H, C, T = 2, 4, 128, 512
    q, k, v = _qkv(B, T, C, seed=7)
    mesh = sp_mesh(4, jax.devices()[:8], n_data=2)
    with jax.sharding.set_mesh(mesh):
        got = sp_flash_attention_long(
            q, k, v, num_heads=H, seq_axis="seq", interpret=True
        )
    want = attention_reference(q, k, v, num_heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_encoder_sp_flash_route_matches_single_device():
    """END-TO-END: encoder under dp×sp with the long-T flash route ON
    equals the plain single-device encoder — the SP recipe no longer
    bypasses the one Pallas kernel that matters at long T."""
    import dataclasses

    from sls_tpu.config import tiny_xlsr_config
    from sls_tpu.encoder.xlsr import XLSREncoder
    from sls_tpu.evaluation.overlap import length_buckets
    from sls_tpu.parallel.sequence import sp_mesh

    base = tiny_xlsr_config(flash_long_t=0)
    wav_len = length_buckets(base, t_targets=(512,))[512]
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(0, 0.1, (2, wav_len)).astype(np.float32))

    enc = XLSREncoder(base)
    params = enc.init(jax.random.PRNGKey(0), wav[:, :1000])["params"]
    want = enc.apply({"params": params}, wav, train=False)

    sp_cfg = dataclasses.replace(base, flash_long_t=256, seq_axis="seq")
    mesh = sp_mesh(4, jax.devices()[:8], n_data=2)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(
            lambda p, w: XLSREncoder(sp_cfg).apply(
                {"params": p}, w, train=False)
        )(params, wav)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=3e-5)


def test_encoder_sp_flash_falls_back_on_ragged_shard():
    """When T/n_seq is too ragged for the kernel the gate must fall back
    to XLA attention (correctness over the kernel), not crash."""
    import dataclasses

    from sls_tpu.config import tiny_xlsr_config
    from sls_tpu.encoder.xlsr import XLSREncoder
    from sls_tpu.parallel.sequence import sp_mesh

    base = tiny_xlsr_config(flash_long_t=0)
    # wav giving T not divisible by 4 shards x 128 block
    rng = np.random.default_rng(2)
    wav_len = 1000
    base_enc = XLSREncoder(base)
    params = base_enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, wav_len)))["params"]
    wav = jnp.asarray(rng.normal(0, 0.1, (2, wav_len)).astype(np.float32))
    want = base_enc.apply({"params": params}, wav, train=False)

    t = base.num_frames(wav_len)
    assert t % 4 or (t // 4) % 128, "pick a wav_len with a ragged shard"
    sp_cfg = dataclasses.replace(base, flash_long_t=max(1, t - 1),
                                 seq_axis="seq")
    mesh = sp_mesh(4, jax.devices()[:8], n_data=2)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(
            lambda p, w: XLSREncoder(sp_cfg).apply(
                {"params": p}, w, train=False)
        )(params, wav)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=3e-5)


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


def test_sp_flash_ragged_shard_clear_error():
    """A direct sp_flash_attention_long call on a ragged local shard
    must fail with the divisibility message, not an 'int % NoneType'
    TypeError from inside shard_map tracing."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from sls_tpu.kernels.flash_attention import sp_flash_attention_long

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    B, T, C = 2, 4 * 72, 64  # local shard 72: no q-block >=128 divides it
    q = jnp.zeros((B, T, C), jnp.float32)
    with jax.sharding.set_mesh(mesh):
        with pytest.raises(ValueError, match="no q-block"):
            jax.jit(lambda q: sp_flash_attention_long(
                q, q, q, num_heads=4, seq_axis="seq", interpret=True,
            ))(q)
