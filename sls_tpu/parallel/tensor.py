"""Tensor-parallel (Megatron-style MLP sharding) over a 2-D mesh.

The reference has no model parallelism of any kind (SURVEY §2.10: only
``nn.DataParallel``).  The 300M flagship fits one chip, so pure DP is
the default and the *fast* layout — this module exists for the scale-out
axis the TPU design should own: a 2-D ``('data', 'model')`` mesh where
the WIDE dimensions (transformer FFN 4096, SAE dictionary 4096) are
sharded over 'model' and XLA/GSPMD inserts the collectives.

Sharding rules (column→row parallel pairs, Shoeybi et al. 2019 — public
Megatron-LM paper; applied here via `jax.sharding` annotations only, no
manual collectives):

- ``fc1/kernel [D, F]``  → P(None, 'model')   (column-parallel up-proj)
- ``fc1/bias   [F]``     → P('model')
- ``fc2/kernel [F, D]``  → P('model', None)   (row-parallel down-proj;
  GSPMD inserts the partial-sum all-reduce)
- ``W_enc [D, M]``       → P(None, 'model')   (SAE encode)
- ``b_enc [M]``          → P('model')
- ``W_dec [M, D]``       → P('model', None)   (SAE decode)
- everything else        → P() (replicated)

The TopK sparsification runs over the full dictionary axis, so GSPMD
gathers the sharded activations before ``top_k`` — correct by
construction; the fused Pallas SAE kernel is bypassed under TP (Pallas
calls don't shard transparently), so ``use_pallas`` should stay off
when ``model_parallel > 1``.

Optimizer state (Adam mu/nu mirror the param tree) inherits the same
leaf shardings — a free ZeRO-ish side effect: sharded moments for the
sharded weights.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (suffix of the param path) -> spec builder; checked in order
_RULES = (
    (("fc1", "kernel"), lambda axis: P(None, axis)),
    (("fc1", "bias"), lambda axis: P(axis)),
    (("fc2", "kernel"), lambda axis: P(axis, None)),
    (("W_enc",), lambda axis: P(None, axis)),
    (("b_enc",), lambda axis: P(axis)),
    (("W_dec",), lambda axis: P(axis, None)),
)


def _path_names(path) -> tuple:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return tuple(names)


def spec_for_path(path, leaf, axis: str, n_shards: int) -> P:
    """PartitionSpec for one state leaf (replicated when no rule hits or
    the sharded dim doesn't divide the axis size)."""
    names = _path_names(path)
    for suffix, build in _RULES:
        if len(names) >= len(suffix) and tuple(names[-len(suffix):]) == suffix:
            spec = build(axis)
            # the dim being sharded must divide the mesh axis
            for dim, ax in enumerate(spec):
                if ax is not None:
                    if leaf.ndim <= dim or leaf.shape[dim] % n_shards:
                        return P()
            return spec
    return P()


def state_shardings(state_tree: Any, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for a TrainState/params tree on a 2-D mesh.

    Works on any pytree whose leaf paths end in the rule suffixes —
    the optimizer-state subtrees mirror the param paths, so Adam
    moments of sharded weights come out sharded identically.
    """
    n_shards = mesh.shape[axis]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, spec_for_path(path, leaf, axis, n_shards))

    return jax.tree_util.tree_map_with_path(to_sharding, state_tree)


def place_state(state_tree: Any, shardings) -> Any:
    """Device-put a state pytree onto its sharding tree.

    Leaf-wise zip rather than ``tree.map``: the two trees can differ in
    STATIC aux data (e.g. two TrainStates whose ``tx`` closures are
    distinct objects) while sharing the same leaf structure.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state_tree)
    sh_leaves = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    if len(leaves) != len(sh_leaves):
        raise ValueError(
            f"state has {len(leaves)} leaves but shardings has "
            f"{len(sh_leaves)}"
        )
    placed = [jax.device_put(x, s) for x, s in zip(leaves, sh_leaves)]
    return jax.tree_util.tree_unflatten(treedef, placed)


def tp_mesh_and_config(cfg, devices=None):
    """Build the ('data','model') mesh for ``cfg.train.model_parallel``
    and apply the TP-required model tweaks (einsum pos_conv — see the
    GSPMD grouped-conv grad bug regression test — and the XLA SAE path,
    since Pallas calls don't shard transparently).

    Returns (mesh, possibly-updated cfg).
    """
    import dataclasses

    from sls_tpu.parallel.mesh import make_mesh

    mp = cfg.train.model_parallel
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) % mp:
        raise ValueError(
            f"model_parallel={mp} must divide device count {len(devs)}"
        )
    mesh = make_mesh(
        devs, shape=(len(devs) // mp, mp), axis_names=("data", "model")
    )
    model_cfg = cfg.model
    if not model_cfg.encoder.grouped_conv_einsum:
        model_cfg = dataclasses.replace(
            model_cfg,
            encoder=dataclasses.replace(
                model_cfg.encoder, grouped_conv_einsum=True
            ),
        )
    if model_cfg.sae.use_pallas:
        print(
            "NOTE: model_parallel > 1 disables the Pallas SAE kernel "
            "(per-shard Pallas needs shard_map); using the XLA SAE path",
            flush=True,
        )
        model_cfg = dataclasses.replace(
            model_cfg,
            sae=dataclasses.replace(model_cfg.sae, use_pallas=False),
        )
    if model_cfg is not cfg.model:
        cfg = dataclasses.replace(cfg, model=model_cfg)
    return mesh, cfg


def count_sharded(shardings) -> int:
    """Number of leaves with a non-replicated spec (for logging/tests)."""
    return sum(
        1
        for s in jax.tree.leaves(
            shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
        )
        if isinstance(s, NamedSharding) and s.spec != P()
    )
