"""End-to-end detector + sharded training tests on an 8-device CPU mesh.

Small-scale integration in the spirit of the reference's --quick_test
escape hatch (reference: main.py:111-113), plus the multi-chip coverage
the reference never had (SURVEY.md §4).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.config import (
    CPCConfig,
    ExperimentConfig,
    ModelConfig,
    SAEConfig,
    TrainConfig,
    tiny_xlsr_config,
)
from sls_tpu.models.detector import Detector
from sls_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from sls_tpu.train.loss import nll, weighted_nll
from sls_tpu.train.steps import create_train_state, make_eval_step, make_train_step

WAV_LEN = 1000  # -> 49 frames with the tiny conv stack


def tiny_model_config(**overrides) -> ModelConfig:
    base = dict(
        encoder=tiny_xlsr_config(),
        use_sae=True,
        use_sparse_features=True,
        sae=SAEConfig(activation_dim=64, dict_size=256, k=32, variant="per_timestep"),
        classifier_hidden=32,
    )
    base.update(overrides)
    return ModelConfig(**base)


def tiny_experiment(model_cfg=None, **train_overrides) -> ExperimentConfig:
    train = TrainConfig(
        batch_size=8, lr=1e-3, weight_decay=1e-4, **train_overrides
    )
    return ExperimentConfig(
        model=model_cfg or tiny_model_config(), train=train
    )


def synthetic_batch(rng, n, wav_len=WAV_LEN):
    """Separable synthetic task: bonafide = low-frequency tone + noise,
    spoof = pure noise."""
    labels = rng.integers(0, 2, size=n)
    t = np.arange(wav_len) / 16000.0
    wavs = rng.normal(0, 0.05, size=(n, wav_len)).astype(np.float32)
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    wavs[labels == 1] += 0.3 * tone
    return jnp.asarray(wavs), jnp.asarray(labels)


class TestLosses:
    def test_weighted_nll_matches_torch_semantics(self):
        import torch

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(16, 2)).astype(np.float32)
        labels = rng.integers(0, 2, size=16)
        logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
        ours = float(weighted_nll(logp, jnp.asarray(labels), (0.1, 0.9)))
        ref = torch.nn.NLLLoss(weight=torch.tensor([0.1, 0.9]))(
            torch.log_softmax(torch.from_numpy(logits), -1),
            torch.from_numpy(labels),
        )
        assert ours == pytest.approx(float(ref), rel=1e-5)

    def test_unweighted_nll(self):
        logp = jnp.log(jnp.array([[0.9, 0.1], [0.2, 0.8]]))
        labels = jnp.array([0, 1])
        assert float(nll(logp, labels)) == pytest.approx(
            -(np.log(0.9) + np.log(0.8)) / 2, rel=1e-6
        )


class TestDetectorForward:
    def test_forward_outputs(self):
        cfg = tiny_model_config()
        model = Detector(cfg)
        wav = jnp.zeros((2, WAV_LEN))
        variables = model.init(jax.random.PRNGKey(0), wav)
        out = model.apply(variables, wav)
        assert out["log_probs"].shape == (2, 2)
        assert out["score"].shape == (2,)
        assert out["codes"].shape == (2, 49, 256)
        assert out["features"].shape == (2, 49, 64)
        # log-softmax rows sum to 1 in prob space
        np.testing.assert_allclose(
            np.exp(np.asarray(out["log_probs"])).sum(-1), 1.0, atol=1e-5
        )
        # score == P(bonafide)
        np.testing.assert_allclose(
            np.asarray(out["score"]),
            np.exp(np.asarray(out["log_probs"]))[:, 1],
            atol=1e-6,
        )

    def test_recon_feature_classification_path(self):
        cfg = tiny_model_config(use_sparse_features=False)
        model = Detector(cfg)
        wav = jnp.zeros((2, WAV_LEN))
        variables = model.init(jax.random.PRNGKey(0), wav)
        out = model.apply(variables, wav)
        assert out["log_probs"].shape == (2, 2)

    def test_no_sae_path(self):
        cfg = tiny_model_config(use_sae=False)
        model = Detector(cfg)
        wav = jnp.zeros((2, WAV_LEN))
        variables = model.init(jax.random.PRNGKey(0), wav)
        out = model.apply(variables, wav)
        assert float(out["sae_loss"]) == 0.0
        assert "codes" not in out

    def test_cpc_path(self):
        cfg = tiny_model_config(
            use_cpc=True,
            sae=SAEConfig(
                activation_dim=64, dict_size=256, k=32,
                variant="window_hard", window_size=4,
            ),
            cpc=CPCConfig(hidden_dim=32, prediction_steps=(1, 2, 4)),
        )
        model = Detector(cfg)
        wav = jnp.zeros((2, WAV_LEN))
        variables = model.init(jax.random.PRNGKey(0), wav, compute_cpc=True)
        out = model.apply(variables, wav, compute_cpc=True)
        assert out["window_features"].shape == (2, 13, 256)  # ceil(49/4)
        assert np.isfinite(float(out["cpc_loss"]))
        assert float(out["cpc_loss"]) > 0


class TestShardedTraining:
    @pytest.fixture(scope="class")
    def mesh(self):
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        return make_mesh()

    def test_train_step_runs_and_learns(self, mesh):
        cfg = tiny_experiment()
        model = Detector(cfg.model)
        rng = jax.random.PRNGKey(0)
        state = create_train_state(model, cfg, rng, jnp.zeros((2, WAV_LEN)))
        state = replicate(state, mesh)

        train_step = make_train_step(model, cfg, mesh)
        data_rng = np.random.default_rng(0)

        losses = []
        for _ in range(12):
            wav, labels = synthetic_batch(data_rng, 16)
            valid = jnp.ones(16, bool)
            wav, labels, valid = shard_batch((wav, labels, valid), mesh)
            state, metrics = train_step(state, wav, labels, valid, rng)
            losses.append(float(metrics["loss"]))

        assert all(np.isfinite(losses))
        # separable toy task: loss must drop
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    @pytest.mark.parametrize("variant", ["window_overlap", "window_hard"])
    def test_window_variant_train_step(self, mesh, variant):
        """Training must work for the WINDOW variants too — the
        reference's headline w=8 model is trained, not just scored
        (model_window_topk.py).  Regression: jax 0.9.0 cannot linearize
        reduce_window under jit(grad); window_topk_overlap routes the
        window-sum through a tangent-free operand (sparsify.py), which
        this guards — the bug only manifests inside jit, never in eager
        grad, so only a jitted train step catches it."""
        cfg = tiny_experiment(
            tiny_model_config(
                sae=SAEConfig(activation_dim=64, dict_size=256, k=32,
                              variant=variant, window_size=8),
            )
        )
        model = Detector(cfg.model)
        rng = jax.random.PRNGKey(0)
        state = create_train_state(model, cfg, rng, jnp.zeros((2, WAV_LEN)))
        step = make_train_step(model, cfg)
        data_rng = np.random.default_rng(3)
        losses = []
        for _ in range(8):
            wav, labels = synthetic_batch(data_rng, 16)
            state, metrics = step(state, wav, labels,
                                  jnp.ones(16, bool), rng)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # separable toy task: must learn

    def test_eval_step_sharded(self, mesh):
        cfg = tiny_experiment()
        model = Detector(cfg.model)
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0), jnp.zeros((2, WAV_LEN))
        )
        params = replicate(state.params, mesh)
        eval_step = make_eval_step(model, cfg, mesh)
        wav, _ = synthetic_batch(np.random.default_rng(1), 16)
        out = eval_step(params, shard_batch(wav, mesh))
        assert out["score"].shape == (16,)
        assert np.all(np.isfinite(np.asarray(out["score"])))

    def test_sharded_matches_single_device(self, mesh):
        """Gradients under mesh sharding (XLA all-reduce) must match the
        single-device gradients on the same global batch up to float
        reassociation noise.  (Post-Adam params are NOT compared: the
        g/(sqrt(v)+eps) update amplifies noise on near-zero gradients.)"""
        cfg = tiny_experiment()
        model = Detector(cfg.model)
        rng = jax.random.PRNGKey(42)
        wav, labels = synthetic_batch(np.random.default_rng(7), 16)

        state = create_train_state(model, cfg, rng, jnp.zeros((2, WAV_LEN)))

        def loss_fn(params, w, y):
            out = model.apply({"params": params}, w, train=False)
            return weighted_nll(out["log_probs"], y) + 0.1 * out["sae_loss"]

        grads1 = jax.jit(jax.grad(loss_fn))(state.params, wav, labels)

        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        grad8_fn = jax.jit(jax.grad(loss_fn), in_shardings=(repl, data, data))
        params8 = replicate(state.params, mesh)
        swav, slabels = shard_batch((wav, labels), mesh)
        grads8 = grad8_fn(params8, swav, slabels)

        flat1 = jax.tree.leaves(grads1)
        flat8 = jax.tree.leaves(grads8)
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-3
            )


def test_nonfinite_guard_preserves_state():
    """A NaN loss must reject the whole state transition (params AND Adam
    moments) inside the jitted step (ADVICE r1: the old host-side guard
    ran after the update had already poisoned the state)."""
    cfg = tiny_experiment()
    model = Detector(cfg.model)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, jnp.zeros((2, WAV_LEN)))
    step = make_train_step(model, cfg, mesh=None)

    wavs, labels = synthetic_batch(np.random.default_rng(0), 4)
    valid = jnp.ones(4, bool)

    # one good step to warm Adam moments
    state, metrics = step(state, wavs, labels, valid, rng)
    assert bool(metrics["finite"])
    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    opt_before = jax.tree_util.tree_map(np.asarray, state.opt_state)
    step_before = int(state.step)

    bad = wavs.at[0, 0].set(jnp.nan)
    state, metrics = step(state, bad, labels, valid, rng)
    assert not bool(metrics["finite"])
    assert not np.isfinite(float(metrics["loss"]))

    params_after = jax.tree_util.tree_map(np.asarray, state.params)
    opt_after = jax.tree_util.tree_map(np.asarray, state.opt_state)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           params_before, params_after)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           opt_before, opt_after)
    assert int(state.step) == step_before  # rejected steps don't advance

    # and the next good batch still trains
    state, metrics = step(state, wavs, labels, valid, rng)
    assert bool(metrics["finite"])
    assert int(state.step) == step_before + 1
