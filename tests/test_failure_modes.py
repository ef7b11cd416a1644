"""Tests for failure-mode analyses, legacy SAE, threshold encode,
frozen encoder, and resampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.analysis.failure_modes import (
    boundary_error_correlation,
    discriminative_transients_probe,
    global_cue_consistency,
    transient_spike_stats,
)
from tests.test_analysis import sparse_codes


class TestBoundaryErrorCorrelation:
    def test_detects_planted_effect(self):
        rng = np.random.default_rng(0)
        B, T, D, w = 24, 32, 64, 8
        codes = np.zeros((B, T, D), np.float32)
        correct = np.array([True] * 12 + [False] * 12)
        for b in range(B):
            if correct[b]:
                codes[b, :, (b * 3) % D] = 1.0  # stable -> no discontinuity
                codes[b, :, (b * 5 + 1) % D] = 1.0
            else:
                for win in range(T // w):  # new set per window
                    codes[b, win * w : (win + 1) * w, (b + win * 13) % D] = 1.0
                    codes[b, win * w : (win + 1) * w, (b + win * 7 + 1) % D] = 1.0
        out = boundary_error_correlation(codes, correct, w)
        assert out["mean_disc_incorrect"] > out["mean_disc_correct"]
        assert out["p_value"] < 0.01
        assert out["cohens_d"] > 1.0

    def test_degenerate_groups(self):
        codes = sparse_codes(B=3)
        out = boundary_error_correlation(codes, np.array([True] * 3), 8)
        assert out["p_value"] == 1.0


def test_transient_spike_stats():
    codes = np.zeros((1, 8, 4), np.float32)
    codes[0, 3, 0] = 1.0  # isolated spike
    codes[0, :, 1] = 1.0  # persistent
    out = transient_spike_stats(codes)
    # 1 spike among 9 active frame-features
    assert out["spike_fraction"] == pytest.approx(1 / 9)


def test_discriminative_transients_probe():
    rng = np.random.default_rng(1)
    B, T, D = 30, 24, 32
    codes = np.zeros((B, T, D), np.float32)
    labels = np.arange(B) % 2
    for b in range(B):
        # persistent feature 0/1 encodes the class -> persistent probe wins
        codes[b, :, labels[b]] = 1.0
        # transient noise features
        for t in range(0, T, 6):
            codes[b, t, 10 + rng.integers(0, 10)] = 1.0
    out = discriminative_transients_probe(codes, labels, lifetime_threshold=3)
    assert out["n_persistent"] >= 2
    assert out["acc_persistent_only"] > 0.9
    assert out["acc_persistent_only"] >= out["acc_transient_only"]


def test_global_cue_consistency():
    codes = np.zeros((2, 10, 16), np.float32)
    codes[:, :, :4] = 1.0  # same global set everywhere
    out = global_cue_consistency(codes, top_k=4)
    assert out["frame_to_global_jaccard"] == 1.0
    assert out["cross_utterance_global_jaccard"] == 1.0


class TestLegacySAE:
    def test_tied_autoencoder(self):
        from sls_tpu.sae.legacy import TiedSparseAutoencoder, dead_neuron_stats

        sae = TiedSparseAutoencoder(input_dim=32, hidden_dim=64, k=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (10, 32))
        params = sae.init(jax.random.PRNGKey(1), x)
        out = sae.apply(params, x)
        assert out["recon"].shape == (10, 32)
        assert np.all((np.asarray(out["codes"]) > 0).sum(-1) <= 8)
        assert float(out["l1_loss"]) > 0
        assert float(out["loss"]) > float(out["recon_loss"])
        stats = dead_neuron_stats(out["codes"])
        assert 0 <= stats["dead_ratio"] <= 1


def test_threshold_encode():
    from sls_tpu.config import SAEConfig
    from sls_tpu.sae.topk import TopKSAE

    cfg = SAEConfig(activation_dim=16, dict_size=64, k=8)
    sae = TopKSAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 16))
    params = sae.init(jax.random.PRNGKey(1), x)
    acts = sae.apply(params, x, method="pre_activations")
    thresh = jnp.full((64,), float(np.percentile(np.asarray(acts), 90)))
    codes = sae.apply(params, x, thresh, method="encode_threshold")
    assert np.all(np.asarray(codes)[np.asarray(acts) <= np.asarray(thresh)] == 0)
    kept = np.asarray(codes) > 0
    assert kept.sum() > 0


@pytest.mark.slow
def test_frozen_encoder_stops_gradient():
    from sls_tpu.models.detector import Detector
    from sls_tpu.train.loss import weighted_nll
    from tests.test_detector_train import WAV_LEN, tiny_model_config

    cfg = tiny_model_config(freeze_encoder=True)
    model = Detector(cfg)
    wav = jax.random.normal(jax.random.PRNGKey(0), (4, WAV_LEN)) * 0.1
    labels = jnp.asarray([0, 1, 0, 1])
    params = model.init(jax.random.PRNGKey(1), wav)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, wav)
        return weighted_nll(out["log_probs"], labels) + 0.1 * out["sae_loss"]

    grads = jax.grad(loss_fn)(params)
    enc_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["encoder"])
    )
    sae_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["sae"])
    )
    assert enc_norm == 0.0  # frozen
    assert sae_norm > 0.0  # SAE still learns


def test_frozen_encoder_untouched_by_weight_decay():
    """Regression: unmasked add_decayed_weights used to inject wd*p as
    the gradient of stop_gradient'd params, which Adam normalized to a
    ~sign(p)*lr drift per step — the 'frozen' encoder slowly corrupted.
    torch Adam skips requires_grad=False params entirely; so must we."""
    import dataclasses

    import numpy as np

    from sls_tpu.config import ExperimentConfig, TrainConfig
    from sls_tpu.models.detector import Detector
    from sls_tpu.train.steps import create_train_state, make_train_step
    from tests.test_detector_train import WAV_LEN, tiny_model_config

    cfg = ExperimentConfig(
        model=tiny_model_config(freeze_encoder=True),
        train=TrainConfig(batch_size=4, lr=1e-2, weight_decay=1e-2,
                          cut_length=WAV_LEN),
    )
    model = Detector(cfg.model)
    wav = jax.random.normal(jax.random.PRNGKey(0), (4, WAV_LEN)) * 0.1
    labels = jnp.asarray([0, 1, 0, 1])
    valid = jnp.ones(4, bool)
    state = create_train_state(model, cfg, jax.random.PRNGKey(1), wav[:2])
    before_enc = jax.device_get(state.params["encoder"])
    before_sae = jax.device_get(state.params["sae"])
    step = make_train_step(model, cfg, mesh=None)
    state, metrics = step(state, wav, labels, valid, jax.random.PRNGKey(2))
    after_enc = jax.device_get(state.params["encoder"])
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(after_enc),
        jax.tree_util.tree_leaves_with_path(before_enc),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(pa),
        )
    # the unfrozen parts DID move
    after_sae = jax.device_get(state.params["sae"])
    assert any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(after_sae),
                        jax.tree.leaves(before_sae))
    )


def test_sls_freeze_encoder_honored():
    """SLSDetector must stop encoder gradients under freeze_encoder
    (the 'frozen XLS-R + SLS head' baseline, reference README.md:84)."""
    import dataclasses

    from sls_tpu.models.sls import SLSDetector
    from sls_tpu.train.loss import weighted_nll
    from tests.test_detector_train import WAV_LEN, tiny_model_config

    cfg = tiny_model_config(freeze_encoder=True)
    model = SLSDetector(cfg)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, WAV_LEN)) * 0.1
    labels = jnp.asarray([0, 1])
    variables = model.init(jax.random.PRNGKey(1), wav)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            wav, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return weighted_nll(out["log_probs"], labels)

    grads = jax.grad(loss_fn)(variables["params"])
    enc_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["encoder"])
    )
    head_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["sls_head"])
    )
    assert enc_norm == 0.0
    assert head_norm > 0.0


def test_frozen_encoder_has_no_adam_state():
    """Under freeze_encoder the optimizer must maintain NO state for
    the frozen subtree (optax.masked over the whole chain): torch Adam
    over requires_grad=True params allocates no moments for the frozen
    SSL front, and unmasked moments cost ~2.4 GB HBM + a dead
    read+write per step at XLS-R-300M scale."""
    import numpy as np

    from sls_tpu.config import ExperimentConfig, TrainConfig
    from sls_tpu.models.detector import Detector
    from sls_tpu.train.steps import create_train_state
    from tests.test_detector_train import WAV_LEN, tiny_model_config

    cfg = ExperimentConfig(
        model=tiny_model_config(freeze_encoder=True),
        train=TrainConfig(batch_size=4, lr=1e-3, weight_decay=1e-2,
                          cut_length=WAV_LEN),
    )
    model = Detector(cfg.model)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, WAV_LEN)) * 0.1
    state = create_train_state(model, cfg, jax.random.PRNGKey(1), wav)

    n_total = sum(int(np.prod(x.shape))
                  for x in jax.tree.leaves(state.params))
    n_frozen = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params["encoder"]))
    n_opt = sum(int(np.prod(np.shape(x)))
                for x in jax.tree.leaves(state.opt_state))
    # Adam keeps mu+nu for trainable leaves only (+ step counters)
    assert n_opt <= 2 * (n_total - n_frozen) + 16, (
        f"optimizer holds state for frozen params: {n_opt} elements "
        f"vs {2 * (n_total - n_frozen)} trainable-moment elements")


def test_frozen_opt_state_checkpoint_roundtrip(tmp_path):
    """The masked optimizer state (MaskedNode leaves for the frozen
    subtree) must survive the msgpack checkpoint save/restore cycle."""
    import numpy as np

    from sls_tpu.ckpt.checkpoint import load_checkpoint, save_checkpoint
    from sls_tpu.config import ExperimentConfig, TrainConfig
    from sls_tpu.models.detector import Detector
    from sls_tpu.train.steps import create_train_state, make_train_step
    from tests.test_detector_train import WAV_LEN, tiny_model_config

    cfg = ExperimentConfig(
        model=tiny_model_config(freeze_encoder=True),
        train=TrainConfig(batch_size=4, lr=1e-2, weight_decay=1e-2,
                          cut_length=WAV_LEN),
    )
    model = Detector(cfg.model)
    wav = jax.random.normal(jax.random.PRNGKey(0), (4, WAV_LEN)) * 0.1
    labels = jnp.asarray([0, 1, 0, 1])
    valid = jnp.ones(4, bool)
    state = create_train_state(model, cfg, jax.random.PRNGKey(1), wav[:2])
    step = make_train_step(model, cfg, mesh=None)
    state, _ = step(state, wav, labels, valid, jax.random.PRNGKey(2))

    tree = {"params": state.params, "opt_state": state.opt_state}
    save_checkpoint(tmp_path / "last.ckpt", tree, epoch=1)
    fresh = create_train_state(model, cfg, jax.random.PRNGKey(1), wav[:2])
    restored, meta = load_checkpoint(
        tmp_path / "last.ckpt",
        {"params": fresh.params, "opt_state": fresh.opt_state})
    assert meta["epoch"] == 1
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(restored["opt_state"]),
        jax.tree_util.tree_leaves_with_path(state.opt_state),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(pa))


def test_resample_poly():
    from sls_tpu.data.audio import resample_to_16k

    t = np.arange(44100) / 44100.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_to_16k(x, 44100)
    assert abs(len(y) - 16000) <= 1
    # 440 Hz tone survives resampling: strongest rFFT bin ~440 Hz
    spec = np.abs(np.fft.rfft(y[:16000]))
    peak_hz = np.argmax(spec)  # 1-second signal -> bin == Hz
    assert abs(peak_hz - 440) <= 2
    # 16 kHz input is a no-op
    same = resample_to_16k(x[:1600], 16000)
    np.testing.assert_array_equal(same, x[:1600])


def test_pre_masked_optimizer_checkpoint_migrates(tmp_path):
    """A freeze_encoder checkpoint saved BEFORE the optimizer was
    wrapped in optax.masked (bare chain state, full encoder moments)
    must still restore: trainable moments preserved, frozen-subtree
    moments dropped."""
    import numpy as np
    import optax

    from sls_tpu.ckpt.checkpoint import load_checkpoint, save_checkpoint
    from sls_tpu.config import ExperimentConfig, TrainConfig
    from sls_tpu.models.detector import Detector
    from sls_tpu.train.steps import (
        create_train_state, make_optimizer, trainable_decay_mask,
    )
    from tests.test_detector_train import WAV_LEN, tiny_model_config

    cfg = ExperimentConfig(
        model=tiny_model_config(freeze_encoder=True),
        train=TrainConfig(batch_size=4, lr=1e-2, weight_decay=1e-2,
                          cut_length=WAV_LEN),
    )
    model = Detector(cfg.model)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, WAV_LEN)) * 0.1
    new_state = create_train_state(model, cfg, jax.random.PRNGKey(1), wav)

    # the OLD optimizer: decay masked, but moments over the whole tree
    old_tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                            trainable_decay_mask(cfg))
    old_opt_state = old_tx.init(new_state.params)
    # make the trainable moments distinguishable from fresh zeros
    old_opt_state = jax.tree.map(
        lambda x: x + 1.0 if hasattr(x, "shape") and x.dtype.kind == "f"
        else x, old_opt_state)
    save_checkpoint(
        tmp_path / "last.ckpt",
        {"params": new_state.params, "opt_state": old_opt_state},
        epoch=7)

    restored, meta = load_checkpoint(
        tmp_path / "last.ckpt",
        {"params": new_state.params, "opt_state": new_state.opt_state})
    assert meta["epoch"] == 7
    # the masked structure came back, with the migrated moment values
    mu_leaves = [
        np.asarray(x) for x in jax.tree.leaves(restored["opt_state"])
        if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0
    ]
    assert mu_leaves and all((m == 1.0).all() for m in mu_leaves)
