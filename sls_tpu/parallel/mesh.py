"""Device mesh and sharding layout.

Replaces the reference's ``nn.DataParallel`` thread-scatter
(reference: main.py:518) with a single-controller SPMD layout:

- 1-D ``('data',)`` mesh over all chips (v5e-8: 1x8 over ICI)
- batch arrays sharded on axis 0, parameters/optimizer state replicated
- gradient all-reduce compiled by XLA into ICI collectives — no user-level
  communication code, no ``module.`` prefix surgery (main.py:542-560)

The model is 0.3B params (~1.2 GB fp32) so pure data-parallel is the
right layout at v5e scale; the mesh helper accepts extra axes for future
tensor/sequence sharding of the long-context eval path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: 1-D 'data' mesh of every addressable device.  ``shape``
    reshapes the device list for multi-axis layouts, e.g. (4, 2) with
    axis_names ('data', 'model').
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh.

    Multi-host (mesh spans devices of other processes): every process
    must hold the same host values (same-seed init / same checkpoint);
    placement goes through ``make_array_from_callback`` since
    ``device_put`` cannot target non-addressable devices.
    """
    sharding = replicated(mesh)
    local_only = jax.process_count() == 1 or all(
        d.process_index == jax.process_index() for d in mesh.devices.flat
    )
    if local_only:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def place(x):
        host = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    return jax.tree.map(place, tree)


def pad_batch_to_devices(mesh: Mesh, wav, labels=None, valid=None, axis="data"):
    """Pad a host's LOCAL batch so the assembled global batch divides
    the mesh's data axis.

    Padding rows tile row 0 and are marked invalid; losses/metrics mask
    them out (the reference's torch DataLoader had no such constraint —
    any batch size must keep working, e.g. the default 14 on 8 chips).
    Multi-host: each process only needs its rows to fill ITS share of
    the data axis (global assembly concatenates over processes,
    distributed.global_batch) — padding to the full global axis would
    waste a growing fraction of every step as hosts are added (2 hosts
    x 4 devices: 9 local rows pad to 12, not 16).
    Returns (wav, labels, valid) as numpy arrays.
    """
    wav = np.asarray(wav)
    n = wav.shape[0]
    n_total = mesh.devices.size
    n_local = sum(
        d.process_index == jax.process_index() for d in mesh.devices.flat
    )
    # this process's share of the data axis (= full axis when the mesh
    # is single-process or axis-local)
    n_dev = max(1, mesh.shape[axis] * n_local // n_total)
    if valid is None:
        valid = np.ones(n, bool)
    else:
        valid = np.asarray(valid, bool)
    pad = (-n) % n_dev
    if pad:
        wav = np.concatenate([wav, np.repeat(wav[:1], pad, axis=0)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
        if labels is not None:
            labels = np.asarray(labels)
            labels = np.concatenate([labels, np.repeat(labels[:1], pad)])
    return wav, (None if labels is None else np.asarray(labels)), valid
