"""Fused conv front-end kernel (kernels/frontend.py) vs the XLA path.

The fused kernel must reproduce the unfused ConvFeatureExtractor exactly
(same LN/GELU math, fp32 conv accumulation) — reference semantics:
wav2vec/wav2vec2.py:773-851 (ConvFeatureExtractionModel, layer_norm mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.config import XLSRConfig, tiny_xlsr_config
from sls_tpu.encoder.xlsr import ConvFeatureExtractor
from sls_tpu.kernels.frontend import (
    choose_tile,
    frontend_tail_fused,
    required_input,
    tail_lengths,
)


def _extract(cfg, wav, seed=0):
    mod = ConvFeatureExtractor(cfg)
    params = mod.init(jax.random.PRNGKey(seed), wav)
    return mod, params, mod.apply(params, wav)


# 4-layer tiny topology whose tiling satisfies the TPU DMA alignment
# rules (tail stride 8 | tile starts); 6405 samples -> n0=1280, T=159.
FUSED_TINY = dict(
    conv_layers=((32, 10, 5), (32, 3, 2), (32, 3, 2), (32, 2, 2)),
)


def test_fused_matches_unfused_flax_fp32():
    cfg_plain = tiny_xlsr_config(**FUSED_TINY)
    cfg_fused = tiny_xlsr_config(**FUSED_TINY, fused_frontend=True)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 6405))
    mod, params, want = _extract(cfg_plain, wav)
    got = ConvFeatureExtractor(cfg_fused).apply(params, wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_fused_full_xlsr_topology_tiny_dims():
    """Full 7-layer XLS-R layout (64600 samples -> 201 frames) at C=32."""
    layers = tuple((32, k, s) for _, k, s in XLSRConfig().conv_layers)
    cfg_plain = tiny_xlsr_config(conv_layers=layers)
    cfg_fused = tiny_xlsr_config(conv_layers=layers, fused_frontend=True)
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, 64600))
    mod, params, want = _extract(cfg_plain, wav)
    got = ConvFeatureExtractor(cfg_fused).apply(params, wav)
    assert got.shape == (1, 201, 32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_fused_falls_back_when_training():
    cfg = tiny_xlsr_config(**FUSED_TINY, fused_frontend=True)
    wav = jax.random.normal(jax.random.PRNGKey(3), (2, 6405))
    mod = ConvFeatureExtractor(cfg)
    params = mod.init(jax.random.PRNGKey(0), wav)
    # train=True must take the differentiable XLA path
    def loss(p):
        return jnp.sum(mod.apply(p, wav, train=True) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)


def test_fused_falls_back_on_infeasible_tiling():
    # 3-layer tiny config: tail stride 4, T_out=159 has no even divisor
    # and the single-tile aligned read overruns n0 -> must fall back.
    cfg = tiny_xlsr_config(fused_frontend=True)
    wav = jax.random.normal(jax.random.PRNGKey(4), (2, 3200))
    mod = ConvFeatureExtractor(cfg)
    assert not mod._fused_ok(False, 3200)
    params = mod.init(jax.random.PRNGKey(0), wav)
    out = mod.apply(params, wav)  # should run the XLA path, not raise
    assert np.isfinite(np.asarray(out)).all()


def test_param_layout_unchanged():
    """The explicit param declaration must keep nn.Conv/LayerNorm paths
    (checkpoint compatibility: encoder/convert.py writes conv_i/kernel,
    norm_i/LayerNorm_0/{scale,bias})."""
    cfg = tiny_xlsr_config()
    wav = jnp.zeros((1, 3200))
    params = ConvFeatureExtractor(cfg).init(jax.random.PRNGKey(0), wav)["params"]
    assert set(params.keys()) == {
        "conv_0", "conv_1", "conv_2", "norm_0", "norm_1", "norm_2"
    }
    assert params["conv_0"]["kernel"].shape == (10, 1, 32)
    assert params["conv_0"]["bias"].shape == (32,)
    assert params["norm_1"]["LayerNorm_0"]["scale"].shape == (32,)
    assert params["norm_1"]["LayerNorm_0"]["bias"].shape == (32,)


def test_groupnorm_default_mode_param_layout_and_shapes():
    cfg = tiny_xlsr_config(extractor_mode="default", conv_bias=False)
    wav = jax.random.normal(jax.random.PRNGKey(5), (2, 3200))
    mod = ConvFeatureExtractor(cfg)
    params = mod.init(jax.random.PRNGKey(0), wav)
    p = params["params"]
    assert "GroupNorm_0" in p["norm_0"]
    assert "bias" not in p["conv_0"]
    out = mod.apply(params, wav)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


def test_tile_chooser_properties():
    specs = ((3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2))
    n0, c = 12919, 512
    t_out = tail_lengths(n0, specs)[-1]
    assert t_out == 201
    f = choose_tile(t_out, n0, specs, c)
    assert f == 67  # XLS-R headline tiling
    assert required_input(f, specs) == 64 * f + 15
    # infeasible: input too short to cover the halo
    assert choose_tile(t_out, t_out * 64, specs, c) is None


def test_kernel_rejects_bad_tile_override():
    specs = ((3, 2), (2, 2))
    h0 = jnp.zeros((1, 639, 32))
    ws = (jnp.zeros((3, 32, 32)), jnp.zeros((2, 32, 32)))
    with pytest.raises(ValueError):
        frontend_tail_fused(
            h0, ws, jnp.zeros((2, 32)), jnp.zeros((3, 32)), jnp.zeros((3, 32)),
            specs=specs, approx_gelu=False, frames_per_tile=7, interpret=True,
        )
