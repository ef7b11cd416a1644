"""int8 dynamic-quantized serving path (quant/int8.py).

Verifies the three contracts the design rests on:
1. numerics — per-token/per-channel dynamic int8 stays within the
   error envelope expected of 8-bit rounding;
2. tree compatibility — the int8-flagged model has the byte-identical
   param tree of the bf16 model (any checkpoint serves either way);
3. safety — training mode and the fp path reproduce nn.Dense exactly
   (the quantizer can never leak into gradients or golden parity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from sls_tpu.config import tiny_xlsr_config
from sls_tpu.quant.int8 import QuantizableDense, int8_dot


def _tree_spec(tree):
    return jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), tree)


class TestInt8Dot:
    def test_error_envelope(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (64, 256)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (256, 128)).astype(np.float32))
        ref = x @ w
        got = int8_dot(x, w, out_dtype=jnp.float32)
        rel = float(
            jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)
        )
        # 8-bit rounding on both operands of a K=256 contraction:
        # error ~ sqrt(2/12)/127 per element pair, well under 1%
        assert rel < 0.01, rel

    def test_outlier_rows_use_their_own_scale(self):
        # per-token scales: a 1000x outlier row must not destroy the
        # precision of the other rows (per-tensor quant would)
        rng = np.random.default_rng(1)
        x = np.ones((8, 64), np.float32)
        x[0] *= 1000.0
        w = rng.normal(0, 0.1, (64, 32)).astype(np.float32)
        ref = x @ w
        got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(w),
                                  out_dtype=jnp.float32))
        rel_rest = (np.linalg.norm(got[1:] - ref[1:])
                    / np.linalg.norm(ref[1:]))
        assert rel_rest < 0.01, rel_rest

    def test_batched_leading_dims(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 7, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
        got = int8_dot(x, w, out_dtype=jnp.float32)
        assert got.shape == (4, 7, 16)
        flat = int8_dot(x.reshape(28, 32), w, out_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got).reshape(28, 16), np.asarray(flat), rtol=0, atol=0
        )


class TestQuantizableDense:
    def test_fp_path_matches_nn_dense_bitwise(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(5, 24)).astype(np.float32),
                        jnp.bfloat16)
        ref_mod = nn.Dense(16, dtype=jnp.bfloat16, param_dtype=jnp.float32)
        params = ref_mod.init(jax.random.PRNGKey(0), x)
        ref = ref_mod.apply(params, x)
        q_mod = QuantizableDense(16, dtype=jnp.bfloat16, use_int8=False)
        got = q_mod.apply(params, x)
        np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                      np.asarray(got, np.float32))

    def test_param_tree_identical_to_nn_dense(self):
        x = jnp.zeros((2, 24), jnp.bfloat16)
        ref = nn.Dense(16, dtype=jnp.bfloat16,
                       param_dtype=jnp.float32).init(
            jax.random.PRNGKey(0), x)
        q = QuantizableDense(16, dtype=jnp.bfloat16, use_int8=True).init(
            jax.random.PRNGKey(0), x)
        assert _tree_spec(ref) == _tree_spec(q)
        # same init values too (same initializers, same rng)
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(q)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEncoderInt8:
    @pytest.fixture(scope="class")
    def wav(self):
        rng = np.random.default_rng(3)
        return jnp.asarray(rng.normal(0, 0.1, (2, 3200)).astype(np.float32))

    @pytest.mark.parametrize("scope", ["all", "ffn"])
    def test_tree_compatible_and_eval_close(self, wav, scope):
        from sls_tpu.encoder.xlsr import XLSREncoder

        cfg_fp = tiny_xlsr_config()
        cfg_q = tiny_xlsr_config(int8_serving=True, int8_scope=scope)
        enc_fp, enc_q = XLSREncoder(cfg_fp), XLSREncoder(cfg_q)
        params = enc_fp.init(
            {"params": jax.random.PRNGKey(0)}, wav, train=False)
        # the int8-flagged model consumes the SAME checkpoint
        spec_q = _tree_spec(enc_q.init(
            {"params": jax.random.PRNGKey(0)}, wav, train=False))
        assert _tree_spec(params) == spec_q

        ref = enc_fp.apply(params, wav, train=False)
        got = enc_q.apply(params, wav, train=False)
        ref_f = np.asarray(ref, np.float32).reshape(-1, ref.shape[-1])
        got_f = np.asarray(got, np.float32).reshape(-1, got.shape[-1])
        cos = np.sum(ref_f * got_f, -1) / (
            np.linalg.norm(ref_f, axis=-1)
            * np.linalg.norm(got_f, axis=-1) + 1e-12)
        # 8-bit rounding through 2 layers: per-frame direction preserved
        assert float(cos.min()) > 0.99, float(cos.min())

    def test_train_mode_is_exactly_fp(self, wav):
        from sls_tpu.encoder.xlsr import XLSREncoder

        cfg_fp = tiny_xlsr_config()
        cfg_q = tiny_xlsr_config(int8_serving=True)
        enc_fp, enc_q = XLSREncoder(cfg_fp), XLSREncoder(cfg_q)
        params = enc_fp.init(
            {"params": jax.random.PRNGKey(0)}, wav, train=False)
        rngs = {"dropout": jax.random.PRNGKey(7)}
        ref = enc_fp.apply(params, wav, train=True, rngs=rngs)
        got = enc_q.apply(params, wav, train=True, rngs=rngs)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_grads_flow_in_train_mode(self, wav):
        # the int8 branch must never be differentiated; train-mode grads
        # through the int8-flagged model equal the fp model's exactly
        from sls_tpu.encoder.xlsr import XLSREncoder

        cfg_q = tiny_xlsr_config(int8_serving=True)
        cfg_fp = tiny_xlsr_config()
        enc_q, enc_fp = XLSREncoder(cfg_q), XLSREncoder(cfg_fp)
        params = enc_fp.init(
            {"params": jax.random.PRNGKey(0)}, wav, train=False)
        rngs = {"dropout": jax.random.PRNGKey(7)}

        def loss(module):
            def f(p):
                out = module.apply(p, wav, train=True, rngs=rngs)
                return jnp.mean(out.astype(jnp.float32) ** 2)
            return f

        g_fp = jax.grad(loss(enc_fp))(params)
        g_q = jax.grad(loss(enc_q))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_fp),
                        jax.tree_util.tree_leaves(g_q)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDetectorInt8:
    @pytest.mark.parametrize("scope", ["all", "ffn"])
    def test_scores_close_to_fp(self, scope):
        from sls_tpu.config import ModelConfig, SAEConfig
        from sls_tpu.models.detector import Detector

        rng = np.random.default_rng(4)
        wav = jnp.asarray(rng.normal(0, 0.1, (3, 3200)).astype(np.float32))
        enc_fp = tiny_xlsr_config()
        enc_q = tiny_xlsr_config(int8_serving=True, int8_scope=scope)
        sae = SAEConfig(activation_dim=enc_fp.embed_dim, dict_size=128, k=16)
        m_fp = Detector(ModelConfig(encoder=enc_fp, use_sae=True,
                                    use_sparse_features=True, sae=sae))
        m_q = Detector(ModelConfig(encoder=enc_q, use_sae=True,
                                   use_sparse_features=True, sae=sae))
        params = m_fp.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            wav, train=False)
        ref = m_fp.apply(params, wav, train=False)
        got = m_q.apply(params, wav, train=False)
        # scores are log-prob differences on a random-init tiny model;
        # demand close agreement, not bitwise
        np.testing.assert_allclose(
            np.asarray(got["score"], np.float32),
            np.asarray(ref["score"], np.float32), atol=0.05)
