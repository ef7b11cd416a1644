"""Multi-host (multi-process) SPMD wiring.

The reference is strictly single-process — its only multi-device story is
``nn.DataParallel`` thread scatter (reference: main.py:518).  On TPU the
equivalent at pod scale is multi-controller JAX: one Python process per
host, each seeing only its local chips, cooperating through a global
device mesh.  This module owns the three pieces that make the rest of
the framework multi-host-clean without touching model code:

1. ``initialize()`` — ``jax.distributed.initialize`` wrapping with
   explicit-args or env auto-detection (JAX itself auto-detects Cloud
   TPU pods and SLURM clusters when called with no arguments).
2. ``global_batch()`` — assemble a global, mesh-sharded ``jax.Array``
   from each host's process-local batch rows
   (``jax.make_array_from_process_local_data``); single-process it
   degrades to a plain sharded ``device_put``.
3. ``fetch_global()`` — the inverse: materialize a possibly
   non-fully-addressable array on every host (allgather across
   processes) so score collection / EER code can stay plain numpy.

IO gating: exactly one process (``is_primary()``) writes checkpoints,
CSV logs and TensorBoard events; see BaseTrainer.  Scalars returned by
the jitted train/eval steps are computed over the *global* batch inside
jit (XLA psum over the mesh), so they are replicated and every host may
read them without communication.

Tested for real in tests/test_distributed.py: two separate processes,
each with 4 virtual CPU devices, form one 8-device mesh and run a
sharded train step in lockstep (same loss on both hosts, disjoint data).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Connect this process to the JAX distributed runtime.

    Returns True if the distributed client was (or already is) up,
    False when running single-process (no coordinator configured).

    Resolution order for each field: explicit argument >
    SLS_TPU_COORDINATOR / SLS_TPU_NUM_PROCESSES / SLS_TPU_PROCESS_ID env
    vars > JAX's own auto-detection (Cloud TPU pod metadata, SLURM).
    Call this BEFORE any other jax API touches the backend.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "SLS_TPU_COORDINATOR"
    )
    if num_processes is None and "SLS_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SLS_TPU_NUM_PROCESSES"])
    if process_id is None and "SLS_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SLS_TPU_PROCESS_ID"])

    # multi-worker signals only: a single-entry TPU_WORKER_HOSTNAMES
    # (e.g. "localhost", set by single-chip PJRT plugins) is not a pod
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_detectable = (
        "SLURM_JOB_ID" in os.environ
        or "," in hostnames
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not auto_detectable:
        return False  # plain single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except ValueError as e:
        if coordinator_address is not None:
            raise  # explicit config that doesn't work should be loud
        # cluster env looked multi-host but auto-detection found no
        # coordinator (e.g. partial SLURM env) — run single-process
        print(f"NOTE: jax.distributed auto-detect failed ({e}); "
              "running single-process", flush=True)
        return False
    _INITIALIZED = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on exactly one process; gate checkpoint/log/score writes."""
    return jax.process_index() == 0


def global_batch(tree, mesh, axis: str = "data"):
    """Assemble a batch-sharded global array pytree from local rows.

    Multi-process: every host passes its process-local rows (its
    ``DatasetIndex.host_shard`` slice) and receives a global
    ``jax.Array`` whose batch axis is the concatenation over processes,
    laid out on the mesh's data axis.  Single-process: plain sharded
    device_put (identical semantics, no collective).

    All hosts must pass the same local row count — use
    ``host_shard(..., drop_remainder=True)`` for training loaders.

    Note: multi-process assembly goes through host memory
    (``np.asarray``), so passing an already-on-device array (e.g. the
    RawBoost-augmented batch) costs one device→host fetch per batch.
    Fine at audio-batch sizes (~30 MB); if it ever shows up in a
    profile, build the global array with
    ``jax.make_array_from_single_device_arrays`` from locally-sharded
    pieces instead.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def fetch_global(x) -> np.ndarray:
    """``np.asarray`` that also works on non-fully-addressable arrays.

    Single-process (or fully-replicated input): a plain device fetch.
    Multi-process with a sharded input: allgather across processes so
    every host sees the full global array (scores, per-example outputs).
    """
    if isinstance(x, np.ndarray) or jax.process_count() == 1:
        return np.asarray(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def local_rows(x) -> np.ndarray:
    """This process's contiguous row block of a batch-sharded array.

    The inverse access pattern to ``global_batch``: fetches only the
    rows owned by this host's devices — no cross-host traffic.
    Identity single-process.  Handles fully-replicated arrays (XLA may
    replicate small outputs) by slicing the process-order block.
    """
    if jax.process_count() == 1 or isinstance(x, np.ndarray):
        return np.asarray(x)
    if getattr(x, "is_fully_replicated", False):
        n_local = x.shape[0] // jax.process_count()
        lo = jax.process_index() * n_local
        return np.asarray(x)[lo : lo + n_local]
    shards = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        shards[start] = s
    return np.concatenate(
        [np.asarray(shards[k].data) for k in sorted(shards)], axis=0
    )


def allgather_rows(x) -> np.ndarray:
    """Concatenate per-process host arrays into the global row order.

    Every process passes its local rows (same shape everywhere); the
    result is the process-index-ordered concatenation — aligned with the
    batch axis that ``global_batch`` builds.  Identity single-process.
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def allgather_ragged_rows(x) -> np.ndarray:
    """``allgather_rows`` for per-process arrays of UNEQUAL leading size
    (e.g. per-host validation score vectors).  Pads to the global max,
    gathers, and drops the padding.  Identity single-process."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    lengths = allgather_rows(np.asarray([x.shape[0]], np.int64))
    max_len = int(lengths.max())
    pad = np.zeros((max_len - x.shape[0],) + x.shape[1:], x.dtype)
    gathered = allgather_rows(np.concatenate([x, pad], axis=0))
    parts = np.split(gathered, jax.process_count(), axis=0)
    return np.concatenate(
        [p[: int(n)] for p, n in zip(parts, lengths)], axis=0
    )


def allreduce_sum_scalars(values: Sequence[float]) -> np.ndarray:
    """Sum a small vector of host scalars across processes (identity
    single-process).  Used for epoch-level loss/count accumulators."""
    v = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return v
    return allgather_rows(v[None, :]).sum(axis=0)


def merge_part_files(out_path) -> None:
    """Merge per-host ``<out>.part<i>`` files into ``out_path``.

    Call on EVERY host after each wrote its part (barrier inside); the
    primary concatenates in process order and removes the parts.
    No-op single-process (callers write ``out_path`` directly then).

    REQUIRES SHARED STORAGE (same as checkpoint resume): the primary
    opens every host's part file locally, so ``out_path`` must live on
    a filesystem visible to all hosts (NFS/GCS-fuse).  On pods with
    host-local disks, point ``--eval_output`` at shared storage; a
    missing part raises with this explanation rather than a bare
    FileNotFoundError after the whole eval has completed.
    """
    if jax.process_count() == 1:
        return
    sync_hosts("parts-written")
    missing = []
    if is_primary():
        missing = [
            f"{out_path}.part{i}"
            for i in range(jax.process_count())
            if not os.path.exists(f"{out_path}.part{i}")
        ]
    # broadcast the missing-parts verdict BEFORE anyone raises: if only
    # the primary raised, every other host would block forever at the
    # final barrier — a distributed hang instead of a loud failure
    any_missing = float(allreduce_sum_scalars([float(len(missing))])[0])
    if any_missing:
        raise FileNotFoundError(
            f"merge_part_files: primary is missing {int(any_missing)} "
            f"part file(s){' ' + str(missing) if missing else ''} — part "
            "files must be written to storage shared by all hosts "
            "(NFS/GCS); host-local disks cannot be merged by the primary."
        )
    if is_primary():
        import shutil

        with open(out_path, "wb") as fout:
            for i in range(jax.process_count()):
                part = f"{out_path}.part{i}"
                with open(part, "rb") as fin:
                    shutil.copyfileobj(fin, fout)
                os.unlink(part)
    sync_hosts("parts-merged")


def part_path(out_path) -> str:
    """Per-host output path: ``<out>.part<i>`` multi-process, ``out``
    single-process."""
    if jax.process_count() == 1:
        return str(out_path)
    return f"{out_path}.part{jax.process_index()}"


def sync_hosts(name: str = "sync") -> None:
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
