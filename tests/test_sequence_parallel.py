"""Sequence-parallel layout (parallel/sequence.py) equivalence tests.

A ('data','seq') mesh with transformer activations pinned to the 'seq'
axis must score identically to the single-device program — GSPMD
inserts the K/V all-gathers, so equivalence is a layout property, not a
numerics change.  Runs on the 8-device virtual CPU mesh.  The reference
has no way to put one long utterance on many accelerators (it windows
everything to 64,600 samples — SURVEY §2.7 eval_overlap family); this
is the TPU long-context scale-out axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sls_tpu.models.detector import Detector
from sls_tpu.parallel.sequence import sp_mesh, sp_model_config, sp_scoring_fn
from tests.test_detector_train import WAV_LEN, tiny_model_config


def _ref_scores(base_cfg, wav):
    model = Detector(base_cfg)
    params = model.init(jax.random.PRNGKey(0), wav[:1], train=False)["params"]
    ref = model.apply({"params": params}, wav, train=False)["score"]
    return params, np.asarray(ref)


@pytest.fixture(scope="module")
def base():
    cfg = tiny_model_config()
    wav = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, WAV_LEN)), jnp.float32
    )
    params, ref = _ref_scores(cfg, wav)
    return cfg, wav, params, ref


def test_sp8_scores_match_single_device(base):
    cfg, wav, params, ref = base
    mesh = sp_mesh(8)
    fwd = sp_scoring_fn(Detector(sp_model_config(cfg)), mesh)
    got = np.asarray(fwd(params, wav))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_dp2_x_sp4_composes(base):
    cfg, wav, params, ref = base
    mesh = sp_mesh(4, n_data=2)
    fwd = sp_scoring_fn(Detector(sp_model_config(cfg)), mesh)
    got = np.asarray(fwd(params, wav))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_sp_requires_matching_axis(base):
    cfg, wav, params, _ = base
    mesh = sp_mesh(8)  # model cfg WITHOUT seq_axis set
    with pytest.raises(ValueError, match="seq_axis"):
        sp_scoring_fn(Detector(cfg), mesh)


def test_unwindowed_scoring_with_sp_mesh(base):
    """score_utterances_unwindowed(sp_mesh=...) — the production
    consumer of SP — matches the single-device un-windowed scores."""
    from sls_tpu.evaluation.overlap import score_utterances_unwindowed

    cfg, _, params, _ = base
    enc = cfg.encoder
    rng = np.random.default_rng(5)
    clips = [
        ("short", rng.normal(0, 0.1, 800).astype(np.float32)),
        ("long", rng.normal(0, 0.1, 7000).astype(np.float32)),
    ]
    ref = list(score_utterances_unwindowed(
        Detector(cfg), params, iter(clips), enc, t_targets=(64, 128)))
    got = list(score_utterances_unwindowed(
        Detector(sp_model_config(cfg)), params, iter(clips), enc,
        t_targets=(64, 128), sp_mesh=sp_mesh(8)))
    assert [u for u, _, _ in got] == [u for u, _, _ in ref]
    for (_, s_got, t_got), (_, s_ref, t_ref) in zip(got, ref):
        assert t_got == t_ref
        assert s_got == pytest.approx(s_ref, abs=2e-5)


def test_sp_composes_with_int8_serving(base):
    """int8 dynamic quant (quant/int8.py) reshapes [B,T,C] -> [B*T,C]
    for per-token scales; under SP that reshape crosses the sharded
    frame axis, so prove the combination still matches the
    single-device int8 program."""
    import dataclasses

    cfg, wav, params, _ = base
    i8 = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, int8_serving=True)
    )
    ref = np.asarray(
        Detector(i8).apply({"params": params}, wav, train=False)["score"]
    )
    fwd = sp_scoring_fn(Detector(sp_model_config(i8)), sp_mesh(8))
    got = np.asarray(fwd(params, wav))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ["window_overlap", "window_hard"])
def test_sp_windowed_sae_variants(base, variant):
    """The windowed SAE rules reduce over the frame axis (coverage-
    matrix matmul / reduce_window) — under SP that axis is sharded, so
    GSPMD must insert halo exchanges; prove the scores still match."""
    import dataclasses

    cfg, wav, _, _ = base
    cfg = dataclasses.replace(
        cfg, sae=dataclasses.replace(cfg.sae, variant=variant,
                                     window_size=4)
    )
    model = Detector(cfg)
    params = model.init(jax.random.PRNGKey(0), wav[:1], train=False)[
        "params"
    ]
    ref = np.asarray(
        model.apply({"params": params}, wav, train=False)["score"]
    )
    fwd = sp_scoring_fn(Detector(sp_model_config(cfg)), sp_mesh(8))
    np.testing.assert_allclose(
        np.asarray(fwd(params, wav)), ref, rtol=2e-5, atol=2e-5
    )


def test_sp_train_step_matches_unsharded(base):
    """Loss + scores of one dp2 x sp4 train step == the single-device
    step — the seq annotations must be grad-transparent in VALUE, not
    just compile (the dryrun proves compile; this proves numerics)."""
    import dataclasses

    from sls_tpu.config import ExperimentConfig, TrainConfig
    from sls_tpu.train.steps import create_train_state, make_train_step
    from tests.test_detector_train import synthetic_batch

    model_cfg, *_ = base
    cfg = ExperimentConfig(
        model=model_cfg,
        train=TrainConfig(batch_size=8, lr=1e-3, cut_length=WAV_LEN),
    )
    rng = np.random.default_rng(0)
    wav_np, y_np = synthetic_batch(rng, 8)
    wav = jnp.asarray(np.asarray(wav_np))
    labels = jnp.asarray(np.asarray(y_np))
    valid = jnp.ones((8,), bool)
    key = jax.random.PRNGKey(0)

    model = Detector(cfg.model)
    state0 = create_train_state(model, cfg, key, wav[:2])
    ref_step = make_train_step(model, cfg, mesh=None)
    _, ref_metrics = ref_step(state0, wav, labels, valid, key)

    sp_cfg = dataclasses.replace(cfg, model=sp_model_config(cfg.model))
    sp_model = Detector(sp_cfg.model)
    mesh = sp_mesh(4, n_data=2)
    with jax.sharding.set_mesh(mesh):
        from sls_tpu.parallel.mesh import replicate, shard_batch

        state_sp = replicate(
            create_train_state(sp_model, sp_cfg, key, wav[:2]), mesh
        )
        sp_step = make_train_step(sp_model, sp_cfg, mesh)
        wav_s, labels_s, valid_s = shard_batch((wav, labels, valid), mesh)
        _, sp_metrics = sp_step(state_sp, wav_s, labels_s, valid_s, key)
        sp_loss = float(sp_metrics["loss"])
        sp_scores = np.asarray(sp_metrics["scores"])

    np.testing.assert_allclose(
        sp_loss, float(ref_metrics["loss"]), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        sp_scores, np.asarray(ref_metrics["scores"]), rtol=2e-4, atol=2e-5
    )


def test_sp_program_contains_gather(base):
    """The compiled SP program must actually communicate: attention
    needs full keys/values, so the HLO contains an all-gather (or its
    collective-permute decomposition) — proof the annotation took
    effect rather than GSPMD silently replicating everything."""
    cfg, wav, params, _ = base
    mesh = sp_mesh(8)
    model = Detector(sp_model_config(cfg))
    with jax.sharding.set_mesh(mesh):
        from sls_tpu.parallel.mesh import replicate

        p = replicate(params, mesh)
        w = replicate(wav, mesh)
        lowered = jax.jit(
            lambda p_, w_: model.apply({"params": p_}, w_, train=False)[
                "score"
            ]
        ).lower(p, w)
        hlo = lowered.compile().as_text()
    assert ("all-gather" in hlo) or ("collective-permute" in hlo) or (
        "all-to-all" in hlo
    ), "SP program compiled without any cross-device collective"
