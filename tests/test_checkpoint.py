"""Checkpoint save/load/resume-chain tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.ckpt.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)


def _dummy_state(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "params": {
            "dense": {"kernel": rng.normal(size=(4, 8)).astype(np.float32),
                      "bias": np.zeros(8, np.float32)},
        },
        "opt_state": {"mu": rng.normal(size=(4, 8)).astype(np.float32)},
        "step": np.asarray(17),
    }


def test_roundtrip(tmp_path):
    state = _dummy_state()
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, state, epoch=3, metrics={"val_eer": 4.2},
                    config_json='{"a": 1}')
    loaded, meta = load_checkpoint(path)
    assert meta["epoch"] == 3
    assert meta["metrics"]["val_eer"] == 4.2
    assert meta["config_json"] == '{"a": 1}'
    np.testing.assert_array_equal(
        loaded["params"]["dense"]["kernel"], state["params"]["dense"]["kernel"]
    )


def test_roundtrip_with_template(tmp_path):
    state = _dummy_state()
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, state, epoch=0)
    template = jax.tree.map(lambda x: jnp.zeros_like(jnp.asarray(x)), state)
    restored, _ = load_checkpoint(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored["opt_state"]["mu"]), state["opt_state"]["mu"]
    )


def test_atomicity_no_tmp_left(tmp_path):
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, _dummy_state(), epoch=0)
    assert not list(tmp_path.glob("*.tmp"))


def test_last_best_promotion(tmp_path):
    mgr = CheckpointManager(tmp_path, config_json="{}")
    assert mgr.save_epoch(_dummy_state(0), 0, {"val_eer": 10.0})  # first = best
    assert not mgr.save_epoch(_dummy_state(1), 1, {"val_eer": 12.0})  # worse
    assert mgr.save_epoch(_dummy_state(2), 2, {"val_eer": 8.0})  # better
    _, meta_best = load_checkpoint(mgr.best_path)
    assert meta_best["epoch"] == 2
    _, meta_last = load_checkpoint(mgr.last_path)
    assert meta_last["epoch"] == 2

    # a fresh manager re-reads best metric from disk
    mgr2 = CheckpointManager(tmp_path)
    assert mgr2.best_metric == 8.0
    assert not mgr2.save_epoch(_dummy_state(3), 3, {"val_eer": 9.0})


def test_describe_available_and_missing_resume_error(tmp_path):
    mgr = CheckpointManager(tmp_path, config_json="{}")
    assert "no checkpoints found" in mgr.describe_available()
    mgr.save_epoch(_dummy_state(0), 3, {"val_eer": 9.5})
    desc = mgr.describe_available()
    assert "last.ckpt" in desc and "epoch 3" in desc and "val_eer=9.5" in desc
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="last.ckpt"):
        mgr.resolve_resume(tmp_path / "nope.ckpt")


def test_async_save_epoch(tmp_path):
    """block=False must produce the same files as block=True, one write
    in flight at a time, and wait()/resolve_resume join it."""
    mgr = CheckpointManager(tmp_path, config_json="{}")
    assert mgr.save_epoch(_dummy_state(0), 0, {"val_eer": 10.0}, block=False)
    # improvement decision is made synchronously even before the join
    assert mgr.best_metric == 10.0
    assert mgr.save_epoch(_dummy_state(1), 1, {"val_eer": 7.0}, block=False)
    assert mgr.resolve_resume() == mgr.last_path  # implies wait()
    _, meta_last = load_checkpoint(mgr.last_path)
    assert meta_last["epoch"] == 1
    _, meta_best = load_checkpoint(mgr.best_path)
    assert meta_best["epoch"] == 1
    mgr.wait()  # idempotent


def test_resume_chain(tmp_path):
    mgr = CheckpointManager(tmp_path)
    assert mgr.resolve_resume() is None
    mgr.save_epoch(_dummy_state(), 0, {"val_eer": 5.0})
    assert mgr.resolve_resume().name == "last.ckpt"

    explicit = tmp_path / "other.ckpt"
    save_checkpoint(explicit, _dummy_state(), epoch=9)
    assert mgr.resolve_resume(explicit) == explicit

    with pytest.raises(FileNotFoundError):
        mgr.resolve_resume(tmp_path / "missing.ckpt")

    # best-only dir (last removed) falls back to best
    os.remove(mgr.last_path)
    assert mgr.resolve_resume().name == "best.ckpt"


def test_async_write_failure_surfaces(tmp_path, monkeypatch):
    """An exception on the background writer thread (ENOSPC, NFS error)
    must be re-raised at the next wait()/save_epoch, not swallowed —
    otherwise last/best silently go stale (ADVICE r2, medium)."""
    import sls_tpu.ckpt.checkpoint as ck

    mgr = CheckpointManager(tmp_path, config_json="{}")

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(ck, "save_checkpoint", boom)
    mgr.save_epoch(_dummy_state(0), 0, {"val_eer": 10.0}, block=False)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        mgr.wait()
    # error is consumed once; manager is usable again
    monkeypatch.undo()
    assert not (tmp_path / "last.ckpt").exists()
    mgr.save_epoch(_dummy_state(1), 1, {"val_eer": 9.0}, block=False)
    mgr.wait()
    assert (tmp_path / "last.ckpt").exists()
