"""Tests: StepTimer/profiling utils, pad_batch_to_devices edges,
feature-identity stability."""

import numpy as np
import pytest

from sls_tpu.analysis.temporal import feature_identity_stability
from sls_tpu.parallel.mesh import make_mesh, pad_batch_to_devices
from sls_tpu.train.profiling import StepTimer, device_memory_stats


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    t.start()
    for _ in range(5):
        time.sleep(0.01)
        t.tick()
    s = t.summary(items_per_step=8)
    assert s["steps"] == 4  # warmup discarded
    # lower bound: a tick can never be shorter than its sleep.  No tight
    # upper bound: on a loaded 1-core host a 10 ms sleep has measured
    # 250 ms wall time (scheduler delay), which is exactly what a wall
    # timer SHOULD report.
    assert 0.005 < s["mean_s"] < 5.0
    assert s["items_per_sec"] == pytest.approx(8 / s["mean_s"])
    assert StepTimer().summary() == {"steps": 0}


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    for v in stats.values():
        assert set(v) >= {"bytes_in_use"}


def test_pad_batch_to_devices():
    mesh = make_mesh()
    wav = np.ones((5, 10), np.float32)
    labels = np.arange(5)
    w, l, v = pad_batch_to_devices(mesh, wav, labels)
    assert w.shape[0] % 8 == 0 and w.shape[0] == 8
    assert v.sum() == 5 and not v[5:].any()
    assert len(l) == 8
    # already divisible: no-op
    wav8 = np.ones((8, 4), np.float32)
    w2, l2, v2 = pad_batch_to_devices(mesh, wav8, None)
    assert w2.shape[0] == 8 and l2 is None and v2.all()


def test_feature_identity_stability():
    codes = np.zeros((1, 16, 8), np.float32)
    codes[0, :, 0] = 1.0  # persists across all windows
    codes[0, :8, 1] = 1.0  # only first window
    out = feature_identity_stability(codes, 8)
    assert out["n_windows"] == 2.0
    assert out["identity_carryover"] == pytest.approx(0.5)
    # feature 0 persistence 1.0, feature 1 persistence 0 -> mean 0.5
    assert out["mean_feature_persistence"] == pytest.approx(0.5)


def test_op_histogram_and_compare(tmp_path):
    """op_histogram parses a real jax.profiler capture; compare_profiles
    ranks regressions (the tooling behind BENCH_NOTES_r4
    sls_head_root_cause)."""
    import jax
    import jax.numpy as jnp

    from sls_tpu.train.profiling import compare_profiles, op_histogram, trace

    f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
    x = jnp.ones((64, 64), jnp.float32)
    float(f(x))  # compile outside the capture
    with trace(str(tmp_path)):
        float(f(x))

    # lane names differ per backend (TPU vs /host:CPU) - accept all
    hist = op_histogram(str(tmp_path), lane_filter="")
    assert hist, "no events parsed from the capture"
    assert all(v["count"] >= 1 and v["ms"] >= 0.0 for v in hist.values())
    # grouping collapsed numbered instances
    assert not any(k.rstrip("0123456789").endswith(".") for k in hist)

    rows = compare_profiles(
        {"fusion": {"ms": 1.0, "count": 2}},
        {"fusion": {"ms": 3.0, "count": 2},
         "copy": {"ms": 0.5, "count": 1},
         "tiny": {"ms": 0.01, "count": 1}},
        min_ms=0.05,
    )
    assert rows[0]["op"] == "fusion" and rows[0]["delta_ms"] == 2.0
    assert {r["op"] for r in rows} == {"fusion", "copy"}  # tiny filtered


def test_op_histogram_missing_dir(tmp_path):
    import pytest as _pytest

    from sls_tpu.train.profiling import op_histogram

    with _pytest.raises(FileNotFoundError):
        op_histogram(str(tmp_path / "nope"))


def test_profile_diff_cli(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from sls_tpu.cli.profile_diff import main as pd_main
    from sls_tpu.train.profiling import trace

    f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
    x = jnp.ones((64, 64), jnp.float32)
    float(f(x))
    for name in ("a", "b"):
        with trace(str(tmp_path / name)):
            float(f(x))

    assert pd_main([str(tmp_path / "a"), "--lane", "", "--json",
                    "--min_ms", "0"]) == 0
    import json as _json

    rows = _json.loads(capsys.readouterr().out)
    assert rows and all("ms" in r for r in rows)

    assert pd_main([str(tmp_path / "a"), str(tmp_path / "b"),
                    "--lane", "", "--json", "--min_ms", "0"]) == 0
    rows = _json.loads(capsys.readouterr().out)
    assert rows and all("delta_ms" in r for r in rows)
