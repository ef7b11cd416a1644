"""Equivalence tests for the TopK SAE family against reference semantics.

Reference semantics are re-expressed here independently with numpy/torch
(topk + scatter, per-window Python loops) and compared against the
vectorized TPU formulations in sls_tpu.sae.sparsify.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sls_tpu.config import SAEConfig
from sls_tpu.encoder.convert import sae_state_to_flax, infer_sae_config_from_state
from sls_tpu.sae.sparsify import (
    aggregate_windows_mean,
    topk_per_row,
    topk_per_row_exact,
    window_topk_hard,
    window_topk_overlap,
)
from sls_tpu.sae.topk import TopKSAE, reconstruction_loss


def _torch_topk_scatter(acts: np.ndarray, k: int) -> np.ndarray:
    """torch.topk + scatter, the reference's materialization
    (model.py:73-77)."""
    t = torch.from_numpy(acts)
    vals, idx = t.topk(k, sorted=False, dim=-1)
    return torch.zeros_like(t).scatter_(-1, idx, vals).numpy()


def _np_window_sums_mask(seg_sums: np.ndarray, k: int) -> np.ndarray:
    idx = np.argsort(-seg_sums, axis=-1, kind="stable")[..., :k]
    mask = np.zeros_like(seg_sums)
    np.put_along_axis(mask, idx, 1.0, axis=-1)
    return mask


def _np_window_overlap(x: np.ndarray, k: int, w: int) -> np.ndarray:
    """Loop-form overlap-vote semantics (model_window_topk.py:118-203)."""
    B, T, D = x.shape
    s = max(1, w // 2)
    if s >= T:
        nw, pad = 1, max(0, w - T)
    else:
        nw = (T - w) // s + 1
        pad = max(0, (nw - 1) * s + w - T)
    Tp = T + pad
    xp = np.pad(x, ((0, 0), (0, pad), (0, 0)))
    votes = np.zeros((B, Tp, D))
    for i in range(nw):
        seg = xp[:, i * s : i * s + w, :]
        mask = _np_window_sums_mask(seg.sum(axis=1), k)
        votes[:, i * s : i * s + w, :] += seg * mask[:, None, :]
    out = np.zeros_like(xp)
    for t in range(Tp):
        mask = _np_window_sums_mask(votes[:, t, :], k)
        out[:, t, :] = xp[:, t, :] * mask
    return out[:, :T, :]


def _np_window_hard(x: np.ndarray, k: int, w: int) -> np.ndarray:
    """Loop-form hard-window semantics (model_cpc.py:118-164)."""
    B, T, D = x.shape
    pad = (w - T % w) % w
    xp = np.pad(x, ((0, 0), (0, pad), (0, 0)))
    nw = (T + pad) // w
    out = np.zeros_like(xp)
    for i in range(nw):
        seg = xp[:, i * w : (i + 1) * w, :]
        mask = _np_window_sums_mask(seg.sum(axis=1), k)
        out[:, i * w : (i + 1) * w, :] = seg * mask[:, None, :]
    return out[:, :T, :]


class TestPerRowTopK:
    def test_matches_torch_scatter(self):
        rng = np.random.default_rng(0)
        acts = np.maximum(rng.normal(size=(64, 256)), 0).astype(np.float32)
        k = 32
        ours = np.asarray(topk_per_row(jnp.asarray(acts), k))
        ref = _torch_topk_scatter(acts, k)
        np.testing.assert_allclose(ours, ref, atol=1e-7)

    def test_exact_form_matches_threshold_form(self):
        rng = np.random.default_rng(1)
        acts = rng.uniform(0.01, 1.0, size=(32, 128)).astype(np.float32)
        a = np.asarray(topk_per_row(jnp.asarray(acts), 16))
        b = np.asarray(topk_per_row_exact(jnp.asarray(acts), 16))
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_exactly_k_survivors(self):
        rng = np.random.default_rng(2)
        acts = rng.uniform(0.01, 1.0, size=(16, 512)).astype(np.float32)
        out = np.asarray(topk_per_row(jnp.asarray(acts), 64))
        assert np.all((out > 0).sum(axis=-1) == 64)
        # survivors are the k largest values
        for row_out, row_in in zip(out, acts):
            kept = set(np.flatnonzero(row_out))
            expected = set(np.argsort(-row_in)[:64])
            assert kept == expected


class TestWindowOverlap:
    @pytest.mark.parametrize("T,w", [(16, 8), (32, 8), (12, 4), (8, 8)])
    def test_matches_reference_loop_form(self, T, w):
        # strictly positive activations avoid the reference's zero-vote
        # index-tie artifacts; coverage is complete for these (T, w)
        rng = np.random.default_rng(3)
        x = rng.uniform(0.05, 1.0, size=(2, T, 96)).astype(np.float32)
        k = 16
        ours = np.asarray(window_topk_overlap(jnp.asarray(x), k, w))
        ref = _np_window_overlap(x, k, w)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_uncovered_tail_is_zeroed(self):
        # T=17, w=8, s=4 -> windows cover [0,16); frame 16 uncovered.
        rng = np.random.default_rng(4)
        x = rng.uniform(0.05, 1.0, size=(1, 17, 64)).astype(np.float32)
        out = np.asarray(window_topk_overlap(jnp.asarray(x), 8, 8))
        ref = _np_window_overlap(x, 8, 8)
        np.testing.assert_allclose(out[:, :16], ref[:, :16], atol=1e-5)
        assert np.all(out[:, 16] == 0)  # documented delta vs reference

    def test_sparsity_bound(self):
        rng = np.random.default_rng(5)
        x = np.maximum(rng.normal(size=(2, 24, 128)), 0).astype(np.float32)
        out = np.asarray(window_topk_overlap(jnp.asarray(x), 16, 8))
        assert np.all((out > 0).sum(axis=-1) <= 16)

    @pytest.mark.parametrize("T", [5, 6, 7, 3, 4, 2, 1])
    def test_short_sequences_keep_k_features(self, T):
        """Regression: window//2 < T < window used to produce ZERO
        windows (floor-divided count) and silently zero every code; all
        T < window now pad to one full window."""
        rng = np.random.default_rng(7)
        x = rng.uniform(0.05, 1.0, size=(2, T, 64)).astype(np.float32)
        out = np.asarray(window_topk_overlap(jnp.asarray(x), 8, 8))
        assert out.shape == x.shape
        # every frame keeps the window's selected features (nonzero codes)
        assert np.all((out > 0).sum(axis=-1) > 0)
        assert np.all((out > 0).sum(axis=-1) <= 8)


class TestWindowHard:
    @pytest.mark.parametrize("T,w", [(16, 8), (20, 8), (7, 4)])
    def test_matches_reference_loop_form(self, T, w):
        rng = np.random.default_rng(6)
        x = np.maximum(rng.normal(size=(3, T, 80)), 0).astype(np.float32)
        ours = np.asarray(window_topk_hard(jnp.asarray(x), 12, w))
        ref = _np_window_hard(x, 12, w)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_constant_feature_set_within_window(self):
        rng = np.random.default_rng(7)
        x = rng.uniform(0.05, 1.0, size=(1, 16, 64)).astype(np.float32)
        out = np.asarray(window_topk_hard(jnp.asarray(x), 8, 8))
        for wstart in (0, 8):
            active = (out[0, wstart : wstart + 8] > 0)
            # same support at every frame of the window
            assert np.all(active == active[0])


def test_aggregate_windows_mean():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 10, 16)).astype(np.float32)
    out = np.asarray(aggregate_windows_mean(jnp.asarray(x), 4))
    assert out.shape == (2, 3, 16)
    np.testing.assert_allclose(out[:, 0], x[:, :4].mean(axis=1), atol=1e-6)
    # tail window zero-padded (frames 8,9 + two zero rows) / 4
    np.testing.assert_allclose(out[:, 2], x[:, 8:].sum(axis=1) / 4, atol=1e-6)


class TestTopKSAEModule:
    def _make(self, variant="per_timestep"):
        cfg = SAEConfig(
            activation_dim=32, dict_size=128, k=16, variant=variant, window_size=4
        )
        sae = TopKSAE(cfg)
        params = sae.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 32)))
        return sae, params, cfg

    def test_tied_init(self):
        sae, params, _ = self._make()
        p = params["params"]
        atom_norms = np.linalg.norm(np.asarray(p["W_dec"]), axis=1)
        np.testing.assert_allclose(atom_norms, 1.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p["W_enc"]), np.asarray(p["W_dec"]).T, atol=1e-7
        )
        assert np.all(np.asarray(p["b_enc"]) == 0)
        assert np.all(np.asarray(p["b_dec"]) == 0)

    def test_forward_shapes_and_sparsity(self):
        sae, params, cfg = self._make()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
        recon, codes = sae.apply(params, x)
        assert recon.shape == (2, 8, 32)
        assert codes.shape == (2, 8, 128)
        assert np.all((np.asarray(codes) > 0).sum(-1) <= cfg.k)
        loss = reconstruction_loss(recon, x)
        assert np.isfinite(float(loss))

    def test_window_variant_runs(self):
        sae, params, _ = self._make("window_overlap")
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
        recon, codes = sae.apply(params, x)
        assert codes.shape == (2, 8, 128)

    def test_matches_torch_reference_numerics(self):
        """Full encode/decode vs torch functional computation with shared
        weights, per-timestep variant (model.py:68-89)."""
        rng = np.random.default_rng(9)
        D, M, k = 32, 128, 16
        state = {
            "encoder.weight": rng.normal(size=(M, D)).astype(np.float32),
            "encoder.bias": rng.normal(size=(M,)).astype(np.float32) * 0.1,
            "decoder.weight": rng.normal(size=(D, M)).astype(np.float32),
            "b_dec": rng.normal(size=(D,)).astype(np.float32) * 0.1,
            "k": np.array(k),
        }
        cfg = infer_sae_config_from_state(state, prefix="")
        assert cfg.dict_size == M and cfg.activation_dim == D and cfg.k == k
        cfg = SAEConfig(activation_dim=D, dict_size=M, k=k)

        sae = TopKSAE(cfg)
        params = {"params": sae_state_to_flax(state, prefix="")}
        x = rng.normal(size=(6, D)).astype(np.float32)

        recon, codes = sae.apply(params, jnp.asarray(x))

        xt = torch.from_numpy(x)
        We = torch.from_numpy(state["encoder.weight"])
        be = torch.from_numpy(state["encoder.bias"])
        Wd = torch.from_numpy(state["decoder.weight"])
        bd = torch.from_numpy(state["b_dec"])
        pre = torch.relu((xt - bd) @ We.T + be)
        vals, idx = pre.topk(k, sorted=False, dim=-1)
        codes_t = torch.zeros_like(pre).scatter_(-1, idx, vals)
        recon_t = codes_t @ Wd.T + bd

        np.testing.assert_allclose(np.asarray(codes), codes_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(recon), recon_t.numpy(), atol=1e-4)


class TestKthValueBitSearch:
    """Sort-free threshold (sparsify.kth_value_threshold) vs sorting."""

    def test_matches_sort_positive(self):
        from sls_tpu.sae.sparsify import kth_value_threshold

        rng = np.random.default_rng(11)
        acts = np.maximum(rng.normal(size=(40, 256)), 0).astype(np.float32)
        for k in (1, 16, 100, 256):
            kth = np.asarray(kth_value_threshold(jnp.asarray(acts), k))[:, 0]
            expected = np.sort(acts, axis=-1)[:, -k]
            np.testing.assert_array_equal(kth, expected)

    def test_matches_sort_with_negatives(self):
        from sls_tpu.sae.sparsify import kth_value_threshold

        rng = np.random.default_rng(12)
        acts = rng.normal(size=(16, 128)).astype(np.float32)
        kth = np.asarray(kth_value_threshold(jnp.asarray(acts), 32))[:, 0]
        expected = np.sort(acts, axis=-1)[:, -32]
        np.testing.assert_array_equal(kth, expected)

    def test_exact_on_duplicates(self):
        from sls_tpu.sae.sparsify import kth_value_threshold

        acts = np.array([[1.0, 2.0, 2.0, 2.0, 3.0, 0.0, 0.0, 0.5]],
                        np.float32)
        kth = float(kth_value_threshold(jnp.asarray(acts), 3)[0, 0])
        assert kth == 2.0  # 3rd largest with ties

    def test_grad_flows_through_masked_values(self):
        from sls_tpu.sae.sparsify import topk_per_row

        acts = jnp.asarray(
            np.random.default_rng(13).uniform(0.01, 1, (8, 64)), jnp.float32
        )
        g = jax.grad(lambda a: (topk_per_row(a, 8) ** 2).sum())(acts)
        out = np.asarray(topk_per_row(acts, 8))
        # gradient = 2*a exactly on kept entries, 0 elsewhere
        np.testing.assert_allclose(np.asarray(g), 2 * out, atol=1e-6)


def test_window_overlap_no_tracer_leak_across_jits():
    """Regression: the cached coverage matrix must not leak tracers
    between separate jit traces (it once cached a traced jnp array)."""
    x = jnp.asarray(
        np.random.default_rng(20).uniform(0.05, 1, (1, 16, 32)), jnp.float32
    )
    f1 = jax.jit(lambda a: window_topk_overlap(a, 4, 8).sum())
    f2 = jax.jit(lambda a: window_topk_overlap(a * 2.0, 4, 8).sum())
    float(f1(x))
    float(f2(x))  # second independent trace reuses the cache entry


class TestThresholdCalibration:
    """calibrate_threshold: JumpReLU thresholds reproducing TopK sparsity
    (reference: the trained scalar `threshold` buffer,
    model_backup.py:62,75-108)."""

    def _acts(self, n=512, m=256, seed=0):
        import numpy as np
        # post-ReLU-like: ~half zeros, positive tail
        rng = np.random.default_rng(seed)
        a = rng.normal(0.5, 1.0, size=(n, m)).astype(np.float32)
        return np.maximum(a, 0.0)

    def test_scalar_threshold_reproduces_k(self):
        import jax.numpy as jnp
        import numpy as np

        from sls_tpu.sae.topk import calibrate_threshold

        k = 32
        acts = self._acts()
        t = calibrate_threshold(jnp.asarray(acts), k)
        active = (acts > float(t)).sum(axis=1)
        assert abs(active.mean() - k) < 0.15 * k

    def test_per_feature_threshold_reproduces_k(self):
        import jax.numpy as jnp
        import numpy as np

        from sls_tpu.sae.topk import calibrate_threshold

        k = 32
        acts = self._acts(seed=3)
        t = np.asarray(calibrate_threshold(jnp.asarray(acts), k,
                                           per_feature=True))
        assert t.shape == (acts.shape[1],)
        active = (acts > t).sum(axis=1)
        assert abs(active.mean() - k) < 0.15 * k

    def test_roundtrip_through_encode_threshold(self):
        """Calibrate on pre_activations, then encode_threshold should
        produce ~k active codes per frame with high overlap vs TopK."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from sls_tpu.config import SAEConfig
        from sls_tpu.sae.topk import TopKSAE, calibrate_threshold

        cfg = SAEConfig(activation_dim=64, dict_size=256, k=32)
        sae = TopKSAE(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
        params = sae.init(jax.random.PRNGKey(0), x)["params"]

        acts = sae.apply({"params": params}, x, method="pre_activations")
        t = calibrate_threshold(acts, cfg.k)
        codes_t = np.asarray(sae.apply(
            {"params": params}, x, t, method="encode_threshold"
        ))
        codes_k = np.asarray(sae.apply({"params": params}, x, method="encode"))

        active = (codes_t > 0).sum(axis=1)
        assert abs(active.mean() - cfg.k) < 0.2 * cfg.k
        # the threshold picks (globally) big activations: strong overlap
        # with the per-row TopK support
        inter = ((codes_t > 0) & (codes_k > 0)).sum()
        assert inter / (codes_k > 0).sum() > 0.7

    def test_threshold_from_state(self):
        import numpy as np

        from sls_tpu.sae.topk import threshold_from_state

        state = {"sae.threshold": np.asarray(0.25, np.float32)}
        assert threshold_from_state(state) == 0.25
        # never-calibrated sentinel (-1.0) and missing key -> None
        assert threshold_from_state({"sae.threshold": np.asarray(-1.0)}) is None
        assert threshold_from_state({}) is None
        assert threshold_from_state(
            {"module.sae.threshold": np.asarray(0.5, np.float32)}
        ) == 0.5
