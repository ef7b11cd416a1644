"""Integration test: full Trainer loop on synthetic data (tiny model).

Covers epoch training with device-side RawBoost, validation EER, CSV/
checkpoint emission, resume, and score-file production — the reference's
--quick_test-scale end-to-end path (main.py:714-776) plus resume.
"""

import csv
import dataclasses

import numpy as np
import pytest

from sls_tpu.config import RawBoostConfig, TrainConfig, ExperimentConfig
from sls_tpu.data.pipeline import ArrayLoader
from sls_tpu.metrics.eer import roc_eer
from sls_tpu.scores.writer import read_score_file
from sls_tpu.train.loop import Trainer
from tests.test_detector_train import WAV_LEN, synthetic_batch, tiny_model_config


def _loaders(n_train=48, n_val=24, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    wav_tr, y_tr = synthetic_batch(rng, n_train)
    wav_va, y_va = synthetic_batch(rng, n_val)
    train = ArrayLoader(np.asarray(wav_tr), np.asarray(y_tr),
                        batch_size=batch, shuffle=True)
    val = ArrayLoader(np.asarray(wav_va), np.asarray(y_va), batch_size=batch)
    return train, val


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    run_dir = tmp_path_factory.mktemp("run")
    cfg = ExperimentConfig(
        model=tiny_model_config(),
        train=TrainConfig(
            batch_size=8, lr=1e-3, num_epochs=2, cut_length=WAV_LEN,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=2),
        ),
    )
    trainer = Trainer(cfg, run_dir, tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    train_loader, val_loader = _loaders()
    trainer.fit(train_loader, val_loader)
    return trainer, run_dir, cfg, val_loader


@pytest.mark.slow
def test_fit_writes_log_and_checkpoints(run):
    trainer, run_dir, cfg, _ = run
    with open(run_dir / "training_log.csv") as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["0", "1"]
    assert all(float(r["train_loss"]) > 0 for r in rows)
    assert (run_dir / "last.ckpt").exists()
    assert (run_dir / "best.ckpt").exists()


def test_learns_separable_task(run):
    trainer, _, _, val_loader = run
    metrics = trainer.validate(val_loader)
    assert metrics.eer < 40.0  # random = 50%


@pytest.mark.slow
def test_resume_continues_epoch_count(run):
    trainer, run_dir, cfg, _ = run
    trainer2 = Trainer(cfg, run_dir, tensorboard=False)
    trainer2.init_state(np.zeros((2, WAV_LEN), np.float32))
    assert trainer2.resume()
    assert trainer2.start_epoch == 2
    # fresh_start ignores checkpoints (reference: --fresh_start)
    trainer3 = Trainer(cfg, run_dir, tensorboard=False)
    trainer3.init_state(np.zeros((2, WAV_LEN), np.float32))
    assert not trainer3.resume(fresh_start=True)
    assert trainer3.start_epoch == 0


def test_resume_preserves_params(run):
    trainer, run_dir, cfg, val_loader = run
    before = trainer.validate(val_loader)
    trainer2 = Trainer(cfg, run_dir, tensorboard=False)
    trainer2.init_state(np.zeros((2, WAV_LEN), np.float32))
    trainer2.resume()
    after = trainer2.validate(val_loader)
    assert before.eer == pytest.approx(after.eer, abs=1e-6)
    assert before.loss == pytest.approx(after.loss, rel=1e-5)


def test_produce_scores(run, tmp_path):
    trainer, _, _, _ = run
    rng = np.random.default_rng(9)
    wav, labels = synthetic_batch(rng, 20)
    loader = ArrayLoader(np.asarray(wav), None,
                         utt_ids=[f"E_{i:04d}" for i in range(20)], batch_size=8)
    out_path = tmp_path / "scores.txt"
    n = trainer.produce_scores(loader, out_path)
    assert n == 20
    ids, scores = read_score_file(out_path)
    assert ids == [f"E_{i:04d}" for i in range(20)]
    assert np.all((scores >= 0) & (scores <= 1))  # P(bonafide)
    # scores should separate the synthetic classes at least weakly
    eer = roc_eer(scores, np.asarray(labels))
    assert eer < 50.0


def test_validate_partial_batch_sae_loss_masked(run):
    """sae_loss must be masked over padded tail-fill rows: validating
    N examples must give the same sae_loss whether the final batch is
    full or partial (VERDICT r2 weak #6)."""
    trainer, _, _, _ = run
    rng = np.random.default_rng(3)
    wav, y = synthetic_batch(rng, 20)
    wav, y = np.asarray(wav), np.asarray(y)
    full = ArrayLoader(wav, y, batch_size=10)      # 2 full batches
    ragged = ArrayLoader(wav, y, batch_size=8)     # 8+8+4: padded tail
    m_full = trainer.validate(full)
    m_ragged = trainer.validate(ragged)
    assert m_full.sae_loss == pytest.approx(m_ragged.sae_loss, rel=1e-4)
    # (cls loss is NOT asserted: weighted NLL is weight-normalized per
    # batch — reference semantics, main.py:118-126 — so it legitimately
    # varies with batch composition)
    assert m_full.eer == pytest.approx(m_ragged.eer, abs=1e-9)


def test_produce_scores_int16_wire_identical(run, tmp_path):
    """int16 wire scoring == float32 scoring, bit for bit, when the
    audio lies on the 16-bit grid (as all FLAC-decoded audio does)."""
    from sls_tpu.data.pipeline import to_wire

    trainer, _, _, _ = run
    rng = np.random.default_rng(11)
    wav, _ = synthetic_batch(rng, 20)
    # snap to the i16 grid, mimicking 16-bit-source decode output
    wav_i16 = to_wire(np.asarray(wav), "int16")
    wav_f = wav_i16.astype(np.float32) / 32768.0
    ids = [f"E_{i:04d}" for i in range(20)]
    loader_f = ArrayLoader(wav_f, None, utt_ids=ids, batch_size=8)
    loader_i = ArrayLoader(wav_i16, None, utt_ids=ids, batch_size=8)
    out_f, out_i = tmp_path / "f.txt", tmp_path / "i.txt"
    assert trainer.produce_scores(loader_f, out_f) == 20
    assert trainer.produce_scores(loader_i, out_i) == 20
    ids_f, s_f = read_score_file(out_f)
    ids_i, s_i = read_score_file(out_i)
    assert ids_f == ids_i
    np.testing.assert_array_equal(s_f, s_i)
