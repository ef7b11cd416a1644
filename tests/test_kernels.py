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


def test_encode_topk_fused_matches_reference(weights):
    """Fused matmul+relu+bit-search-topk vs the jnp reference path
    (bf16 matmul tolerance)."""
    from sls_tpu.kernels.sae_kernels import sae_encode_topk_fused
    from sls_tpu.sae.sparsify import topk_per_row

    w = weights
    k = 16
    ref_acts = np.maximum((w["x"] - w["b_dec"]) @ w["w_enc"] + w["b_enc"], 0.0)
    out = np.asarray(
        sae_encode_topk_fused(
            jnp.asarray(w["x"]), jnp.asarray(w["w_enc"]),
            jnp.asarray(w["b_enc"]), jnp.asarray(w["b_dec"]), k=k,
            tile_n=128, interpret=True,
        )
    )
    assert out.shape == ref_acts.shape
    # support: at most k active, and actives are the k largest of the
    # KERNEL's own activations (bf16 matmul shifts values slightly, so
    # compare support sizes + threshold semantics, and values loosely)
    active = out > 0
    assert np.all(active.sum(-1) <= k + 2)  # bf16 ties can add a couple
    assert np.all(active.sum(-1) >= 1)
    # values where active match the bf16 activations within tolerance
    np.testing.assert_allclose(
        out[active], ref_acts[active], rtol=2e-2, atol=2e-2
    )
    # exact-threshold check against the kernel's own dense activations:
    ref_sparse = np.asarray(topk_per_row(jnp.asarray(ref_acts), k))
    overlap = (active & (ref_sparse > 0)).sum() / max((ref_sparse > 0).sum(), 1)
    assert overlap > 0.9  # supports agree up to bf16 reordering


def test_encode_topk_custom_vjp_matches_autodiff(weights):
    """Gradients of the fused path vs jnp autodiff of the same math."""
    from sls_tpu.kernels.sae_kernels import sae_encode_topk
    from sls_tpu.sae.sparsify import topk_per_row
    import jax

    w = weights
    k = 16
    x = jnp.asarray(w["x"][:64])
    W = jnp.asarray(w["w_enc"])
    be = jnp.asarray(w["b_enc"])
    bd = jnp.asarray(w["b_dec"])
    tgt = jnp.asarray(np.random.default_rng(3).normal(size=(64, 512)),
                      jnp.float32)

    def loss_ref(x, W, be, bd):
        acts = jnp.maximum((x - bd) @ W + be, 0.0)
        return ((topk_per_row(acts, k) - tgt) ** 2).mean()

    # interpret mode for the pallas forward on CPU
    import sls_tpu.kernels.sae_kernels as sk
    orig = sk.sae_encode_topk_fused
    sk.sae_encode_topk_fused = lambda *a, **kw: orig(*a, **{**kw,
                                                            "interpret": True})
    try:
        def loss_pal(x, W, be, bd):
            return ((sae_encode_topk(x, W, be, bd, k) - tgt) ** 2).mean()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, W, be, bd)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(x, W, be, bd)
    finally:
        sk.sae_encode_topk_fused = orig

    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


def test_fused_attention_matches_xla():
    from sls_tpu.kernels.attention import fused_attention

    rng = np.random.default_rng(0)
    B, T, H, Dh = 2, 33, 4, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32)) * Dh ** -0.5
    k = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))

    import jax

    scores = jnp.einsum("bthd,bshd->bhts", q, k)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bhts,bshd->bthd", probs, v)

    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_encoder_fused_attention_flag_matches():
    from sls_tpu.config import tiny_xlsr_config
    from sls_tpu.encoder.xlsr import XLSREncoder
    import jax
    import sls_tpu.kernels.attention as attn_mod

    # route the flagged encoder through interpret mode on CPU
    orig = attn_mod.fused_attention
    attn_mod.fused_attention = lambda *a, **kw: orig(*a, interpret=True)
    try:
        cfg_ref = tiny_xlsr_config()
        cfg_fused = tiny_xlsr_config(fused_attention=True)
        wav = jnp.asarray(
            np.random.default_rng(1).normal(0, 0.1, (2, 1000)), jnp.float32
        )
        params = XLSREncoder(cfg_ref).init(jax.random.PRNGKey(0), wav)
        a = XLSREncoder(cfg_ref).apply(params, wav)
        b = XLSREncoder(cfg_fused).apply(params, wav)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)
    finally:
        attn_mod.fused_attention = orig


def test_decode_and_encode_relu_vjps(weights):
    """Custom VJPs of the fused decode / plain-encode paths vs autodiff."""
    from sls_tpu.kernels.sae_kernels import sae_decode, sae_encode_relu
    import sls_tpu.kernels.sae_kernels as sk
    import jax

    w = weights
    codes = jnp.asarray(
        np.maximum(np.random.default_rng(5).normal(size=(64, 512)), 0),
        jnp.float32,
    )
    x = jnp.asarray(w["x"][:64])
    Wd = jnp.asarray(w["w_dec"])
    We = jnp.asarray(w["w_enc"])
    be = jnp.asarray(w["b_enc"])
    bd = jnp.asarray(w["b_dec"])

    orig_dec, orig_enc = sk.sae_decode_fused, sk.sae_encode_fused
    sk.sae_decode_fused = lambda *a, **kw: orig_dec(*a, **{**kw, "interpret": True})
    sk.sae_encode_fused = lambda *a, **kw: orig_enc(*a, **{**kw, "interpret": True})
    try:
        g_ref = jax.grad(lambda c, W, b: ((c @ W + b) ** 2).mean(),
                         argnums=(0, 1, 2))(codes, Wd, bd)
        g_pal = jax.grad(lambda c, W, b: (sae_decode(c, W, b) ** 2).mean(),
                         argnums=(0, 1, 2))(codes, Wd, bd)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

        g_ref = jax.grad(
            lambda x, W, be, bd: (jnp.maximum((x - bd) @ W + be, 0) ** 2).mean(),
            argnums=(0, 1, 2, 3))(x, We, be, bd)
        g_pal = jax.grad(
            lambda x, W, be, bd: (sae_encode_relu(x, W, be, bd) ** 2).mean(),
            argnums=(0, 1, 2, 3))(x, We, be, bd)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    finally:
        sk.sae_decode_fused, sk.sae_encode_fused = orig_dec, orig_enc


def test_topk_sparsify_pallas_matches_jnp():
    from sls_tpu.kernels.sae_kernels import topk_sparsify_pallas
    from sls_tpu.sae.sparsify import topk_per_row

    rng = np.random.default_rng(9)
    x = np.maximum(rng.normal(size=(3, 40, 256)), 0).astype(np.float32)
    ref = np.asarray(topk_per_row(jnp.asarray(x), 32))
    out = np.asarray(
        topk_sparsify_pallas(jnp.asarray(x), 32, tile_n=64, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_window_vote_fused_matches_jnp():
    """Pallas overlap-vote kernel vs sparsify.window_topk_overlap
    (strictly positive acts; even window)."""
    from sls_tpu.kernels.sae_kernels import window_vote_fused
    from sls_tpu.sae.sparsify import window_topk_overlap

    rng = np.random.default_rng(10)
    for T, w in [(16, 8), (17, 8), (201, 8), (12, 4)]:
        x = rng.uniform(0.05, 1.0, (2, T, 128)).astype(np.float32)
        ref = np.asarray(window_topk_overlap(jnp.asarray(x), 16, w))
        out = np.asarray(window_vote_fused(jnp.asarray(x), k=16, window=w,
                                           interpret=True))
        # kernel internals are bf16 (VMEM budget): values match to bf16
        # precision; supports may differ on near-ties within one bf16 ulp
        both = (ref > 0) & (out > 0)
        overlap = both.sum() / max((ref > 0).sum(), 1)
        assert overlap > 0.93, f"T={T} w={w} support overlap {overlap}"
        np.testing.assert_allclose(out[both], ref[both], rtol=2e-2,
                                   atol=2e-2, err_msg=f"T={T} w={w}")


def test_window_vote_pallas_vjp():
    from sls_tpu.kernels.sae_kernels import window_topk_overlap_pallas
    import sls_tpu.kernels.sae_kernels as sk
    import jax

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0.05, 1.0, (2, 16, 64)), jnp.float32)
    orig = sk.window_vote_fused
    sk.window_vote_fused = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        g = jax.grad(lambda a: (window_topk_overlap_pallas(a, 8, 8) ** 2).sum())(x)
        out = np.asarray(window_topk_overlap_pallas(x, 8, 8))
        np.testing.assert_allclose(np.asarray(g), 2 * out, atol=1e-6)
    finally:
        sk.window_vote_fused = orig


def test_fused_attention_heads_matches_einsum():
    """Head-blocked VMEM attention (lane-sliced [B,T,C] layout) ==
    reference einsum attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sls_tpu.kernels.attention import fused_attention_heads

    B, T, H, Dh = 2, 40, 4, 16
    C = H * Dh
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 0.5, (B, T, C)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (B, T, C)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (B, T, C)), jnp.float32)

    qh = q.reshape(B, T, H, Dh)
    kh = k.reshape(B, T, H, Dh)
    vh = v.reshape(B, T, H, Dh)
    s = jnp.einsum("bthd,bshd->bhts", qh, kh)
    p = jax.nn.softmax(s, -1)
    ref = np.asarray(jnp.einsum("bhts,bshd->bthd", p, vh).reshape(B, T, C))

    got = np.asarray(fused_attention_heads(q, k, v, H, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
