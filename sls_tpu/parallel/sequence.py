"""Sequence parallelism for long-context (un-windowed) scoring.

The reference scores long clips by chopping them into 64,600-sample
windows (`eval_overlap` family — see evaluation/overlap.py for the
windowed ports); nothing in it can put ONE long utterance on MANY
accelerators.  This module adds that capability the TPU way — no manual
collectives, just sharding annotations:

- a ``('data', 'seq')`` mesh (``sp_mesh``);
- ``XLSRConfig.seq_axis = 'seq'`` makes the encoder pin the frame axis
  of every transformer-layer activation to the 'seq' mesh axis
  (encoder/xlsr.py ``_seq_shard``; batch/channel stay UNCONSTRAINED so
  the same annotation composes with dp batch sharding);
- GSPMD then derives the program: LayerNorm, FFN, the SAE and the
  classifier head are element-/row-parallel in T and shard for free;
  attention needs full keys/values, so XLA inserts one K/V all-gather
  per layer ([B, T, C] bf16 — ~10 MB at T=5120 — riding ICI), and the
  final mean-pool becomes a psum.

Scope/costs, stated honestly:

- the conv front-end is O(T) and runs UNSHARDED (GSPMD halo-exchange
  through 7 strided convs buys nothing at these sizes); at long T the
  O(T^2) attention dominates, which is exactly the regime this path
  targets.
- Pallas kernels don't shard transparently THROUGH GSPMD, so
  ``sp_model_config`` turns the fused SAE / fused frontend kernels off
  (same rule as tensor-parallel, parallel/tensor.py:23-27) — with ONE
  deliberate exception: the long-T flash attention kernel, the kernel
  that matters in exactly the regime SP targets, runs per-shard inside
  a ``jax.shard_map`` (Q stays on its frame shard, K/V all-gather;
  kernels/flash_attention.py ``sp_flash_attention_long``), so the
  sharded long-T path keeps the VMEM score behavior instead of falling
  back to XLA attention.  Ragged shard lengths fall back to XLA
  attention automatically (encoder gate checks divisibility).
- eval-only intent: training uses 201-frame windows where SP has
  nothing to win; the annotations are differentiable, so the dryrun
  exercises a dp x sp train step anyway as a compile proof.

Like every config knob, ``seq_axis`` never changes results — only the
layout; tests/test_sequence_parallel.py proves score equivalence
against the single-device program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from sls_tpu.parallel.mesh import make_mesh, replicate


def sp_mesh(
    n_seq: int,
    devices: Optional[Sequence[jax.Device]] = None,
    n_data: int = 1,
) -> Mesh:
    """('data', 'seq') mesh: n_data x n_seq over the given devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data * n_seq > len(devs):
        raise ValueError(
            f"dp{n_data} x sp{n_seq} needs {n_data * n_seq} devices, "
            f"have {len(devs)}"
        )
    return make_mesh(
        devs[: n_data * n_seq],
        shape=(n_data, n_seq),
        axis_names=("data", "seq"),
    )


def sp_model_config(model_cfg, axis: str = "seq"):
    """ModelConfig adjusted for sequence-parallel execution.

    Sets ``encoder.seq_axis`` and disables every Pallas kernel that
    is not already gated on seq_axis: the fused SAE and the fused
    frontend (Pallas calls don't shard transparently; the XLA paths
    are numerically identical — tests/test_sae.py,
    tests/test_frontend_kernel.py).  The long-T flash attention kernel
    stays ON: the encoder routes it through a per-shard shard_map
    (sp_flash_attention_long) when the layout divides cleanly.
    """
    enc = model_cfg.encoder
    if enc.seq_axis != axis or enc.fused_frontend:
        # fused_frontend is a Pallas custom call too — cleared here so
        # every Pallas kernel is off under SP, not just attention/SAE
        model_cfg = dataclasses.replace(
            model_cfg,
            encoder=dataclasses.replace(
                enc, seq_axis=axis, fused_frontend=False
            ),
        )
    if getattr(model_cfg, "sae", None) is not None and model_cfg.sae.use_pallas:
        model_cfg = dataclasses.replace(
            model_cfg,
            sae=dataclasses.replace(model_cfg.sae, use_pallas=False),
        )
    return model_cfg


def sp_scoring_fn(model, mesh: Mesh):
    """Jitted ``fwd(params, wav) -> scores`` running under ``mesh``.

    ``model.config.encoder.seq_axis`` must name an axis of ``mesh``
    (use ``sp_model_config``).  Params are placed replicated on first
    call; the wav batch is replicated too (it is the cheap O(T) input —
    activations become sharded at the first annotation inside the
    encoder).  The ambient-mesh context (``jax.sharding.set_mesh``) is
    what lets the encoder's bare PartitionSpec annotations resolve.
    """
    axis = model.config.encoder.seq_axis
    if not axis or axis not in mesh.axis_names:
        raise ValueError(
            f"model seq_axis={axis!r} is not an axis of mesh "
            f"{mesh.axis_names}; build the config with sp_model_config()"
        )

    jfwd = jax.jit(
        lambda params, w: model.apply({"params": params}, w, train=False)[
            "score"
        ]
    )
    placed = {}

    def fwd(params, wav):
        with jax.sharding.set_mesh(mesh):
            if placed.get("params") is not params:
                placed["placed"] = replicate(params, mesh)
                placed["params"] = params
            wav = replicate(wav, mesh)
            return jfwd(placed["placed"], wav)

    return fwd
