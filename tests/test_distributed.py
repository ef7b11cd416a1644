"""Multi-host wiring tests (sls_tpu/parallel/distributed.py).

The reference is strictly single-process (nn.DataParallel,
reference: main.py:518); multi-host SPMD is new TPU-native capability.
Single-process helpers are tested in-process on the 8-device virtual CPU
mesh; the real thing is tested by launching TWO separate processes that
form one global mesh over Gloo and run the full Trainer path in lockstep
(tests/_dist_worker.py).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.data.pipeline import DatasetIndex
from sls_tpu.parallel import distributed as dist
from sls_tpu.parallel.mesh import make_mesh
from sls_tpu.scores.writer import read_score_file


def test_initialize_noop_without_coordinator(monkeypatch):
    for var in ("SLS_TPU_COORDINATOR", "SLURM_JOB_ID",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert dist.initialize() is False
    assert dist.process_count() == 1
    assert dist.is_primary()


def test_single_process_helpers_are_identity():
    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    g = dist.global_batch(x, mesh)
    np.testing.assert_array_equal(np.asarray(g), x)
    np.testing.assert_array_equal(dist.fetch_global(g), x)
    np.testing.assert_array_equal(dist.allgather_rows(x), x)
    np.testing.assert_array_equal(dist.allgather_ragged_rows(x), x)
    np.testing.assert_array_equal(
        dist.allreduce_sum_scalars([1.0, 2.5]), [1.0, 2.5]
    )
    dist.sync_hosts()  # no-op


def test_fetch_global_on_sharded_array():
    mesh = make_mesh()
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    g = dist.global_batch(x, mesh)
    assert len(g.sharding.device_set) == jax.device_count()
    np.testing.assert_array_equal(dist.fetch_global(g), x)


def test_local_rows_single_process_identity():
    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    g = dist.global_batch(x, mesh)
    np.testing.assert_array_equal(dist.local_rows(g), x)
    np.testing.assert_array_equal(dist.local_rows(x), x)


def test_host_shard_drop_remainder():
    idx = DatasetIndex(
        utt_ids=[f"u{i}" for i in range(10)],
        paths=[Path(f"u{i}") for i in range(10)],
        labels=np.arange(10),
    )
    shards = [idx.host_shard(i, 4, drop_remainder=True) for i in range(4)]
    assert all(len(s) == 2 for s in shards)
    # still disjoint and strided
    ids = sorted(u for s in shards for u in s.utt_ids)
    assert len(set(ids)) == 8
    cover = [idx.host_shard(i, 4) for i in range(4)]
    assert sum(len(s) for s in cover) == 10


@pytest.mark.slow
def test_two_process_training_lockstep(tmp_path):
    """Two real processes × 4 CPU devices = one 8-device global mesh.

    Asserts: identical global val metrics on both hosts, primary-only
    checkpoint/CSV files, and a merged score file covering both hosts'
    disjoint eval shards.
    """
    # ephemeral port: a hardcoded one collides with concurrent runs /
    # leftover processes and hangs until the 900 s subprocess timeout
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, str(Path(__file__).parent / "_dist_worker.py"),
             port, str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    results = [p.communicate(timeout=900) for p in procs]
    report = "\n".join(
        f"--- worker {i} rc={p.returncode}\n{out}\n{err[-2500:]}"
        for i, (p, (out, err)) in enumerate(zip(procs, results))
    )
    assert all(p.returncode == 0 for p in procs), report
    outs = []
    for out, _ in results:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    h0 = next(o for o in outs if o["pid"] == 0)
    h1 = next(o for o in outs if o["pid"] == 1)
    # global metrics must agree bit-for-bit across hosts
    assert h0["val_loss"] == h1["val_loss"]
    assert h0["val_eer"] == h1["val_eer"]
    assert h0["n_scored"] == h1["n_scored"] == 24

    # primary-only IO, written exactly once
    assert (tmp_path / "training_log.csv").exists()
    assert (tmp_path / "last.ckpt").exists()

    # merged score file covers both hosts' disjoint shards; no leftovers
    ids, scores = read_score_file(tmp_path / "scores.txt")
    assert sorted(ids) == sorted(f"utt_{i}" for i in range(24))
    assert np.isfinite(scores).all()
    assert not list(tmp_path.glob("scores.txt.part*"))


class TestMergePartFilesFailLoud:
    """The missing-part verdict must be BROADCAST before anyone raises
    (otherwise non-primary hosts block forever at the final barrier —
    a distributed hang instead of a loud failure)."""

    def _patch(self, monkeypatch, primary: bool, reduce_fn):
        calls = []
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(dist, "is_primary", lambda: primary)
        monkeypatch.setattr(dist, "sync_hosts",
                            lambda name="sync": calls.append(name))

        def reduce(values):
            calls.append("allreduce")
            return reduce_fn(values)

        monkeypatch.setattr(dist, "allreduce_sum_scalars", reduce)
        return calls

    def test_primary_missing_part_raises_after_broadcast(
        self, monkeypatch, tmp_path
    ):
        out = tmp_path / "scores.txt"
        (tmp_path / "scores.txt.part0").write_bytes(b"u0 0.5\n")
        # part1 missing; single-process allreduce is identity
        calls = self._patch(monkeypatch, True, lambda v: np.asarray(v))
        with pytest.raises(FileNotFoundError, match="shared"):
            dist.merge_part_files(out)
        # verdict was broadcast BEFORE the raise, and we never reached
        # the post-merge barrier
        assert calls == ["parts-written", "allreduce"]
        assert not out.exists()

    def test_nonprimary_raises_on_primary_verdict(
        self, monkeypatch, tmp_path
    ):
        # non-primary has no local knowledge of missing parts; the
        # allreduce carries the primary's verdict (sum >= 1)
        calls = self._patch(monkeypatch, False, lambda v: np.asarray([1.0]))
        with pytest.raises(FileNotFoundError):
            dist.merge_part_files(tmp_path / "scores.txt")
        assert calls == ["parts-written", "allreduce"]

    def test_all_parts_present_merges(self, monkeypatch, tmp_path):
        out = tmp_path / "scores.txt"
        (tmp_path / "scores.txt.part0").write_bytes(b"u0 0.5\n")
        (tmp_path / "scores.txt.part1").write_bytes(b"u1 0.25\n")
        calls = self._patch(monkeypatch, True, lambda v: np.asarray(v))
        dist.merge_part_files(out)
        assert out.read_bytes() == b"u0 0.5\nu1 0.25\n"
        assert not list(tmp_path.glob("scores.txt.part*"))
        assert calls == ["parts-written", "allreduce", "parts-merged"]
