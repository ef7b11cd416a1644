"""Build a jitted online scorer from a run directory, either family.

Mirrors the offline loaders (cli/analyze.load_experiment /
load_sls_experiment) but resolves the OPPOSITE int8 default: analysis
strips int8 because it needs exact differentiable numerics, while
serving is exactly what the int8 path is for (quant/int8.py: 1.14x at
a gated-zero EER cost, tests/test_int8_eer_cost.py).  The checkpoint's
own int8 setting is kept unless the caller overrides it.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def load_serving_parts(
    run_dir: str,
    checkpoint: Optional[str] = None,
    int8: Optional[bool] = None,
):
    """(cfg, step, args): the UNJITTED family forward and its non-wav
    arguments, for callers that wrap the staging themselves —
    ``load_serving_model`` jits it; ``serve/export.py`` feeds it to
    ``jax.export``.

    ``step(*args, wav_wire) -> log_probs``; ``args`` is ``(params,)``
    for the detector family and ``(params, batch_stats)`` for SLS.
    ``int8=None`` keeps the checkpoint's serving config; True/False
    force it (scope stays the config's).
    """
    from sls_tpu.ckpt.checkpoint import CheckpointManager, load_checkpoint
    from sls_tpu.config import ExperimentConfig, config_from_dict
    from sls_tpu.train.steps import dequantize_wire

    mgr = CheckpointManager(run_dir)
    path = mgr.resolve_resume(checkpoint)
    if path is None:
        raise FileNotFoundError(f"no checkpoint in {run_dir}")
    raw, meta = load_checkpoint(path)
    cfg = config_from_dict(ExperimentConfig, json.loads(meta["config_json"]))
    if int8 is not None and bool(cfg.model.encoder.int8_serving) != int8:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                encoder=dataclasses.replace(
                    cfg.model.encoder, int8_serving=int8),
            ),
        )
    state = raw.get("state", raw)
    params = state["params"]

    if "sls_head" in params:
        from sls_tpu.models.sls import SLSDetector

        model = SLSDetector(cfg.model)

        def step(params, batch_stats, wav):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                dequantize_wire(wav), train=False,
            )
            return out["log_probs"]

        args = (params, state.get("batch_stats", {}))
    else:
        from sls_tpu.models.detector import Detector

        model = Detector(cfg.model)

        def step(params, wav):
            out = model.apply(
                {"params": params}, dequantize_wire(wav), train=False
            )
            return out["log_probs"]

        args = (params,)

    return cfg, step, args


def load_serving_model(
    run_dir: str,
    checkpoint: Optional[str] = None,
    int8: Optional[bool] = None,
    mesh=None,
):
    """(cfg, forward) for a run dir; family detected from the param tree.

    ``forward(wav_wire [B, cut]) -> log_probs [B, 2]`` (device array;
    callers fetch).  ``int8=None`` keeps the checkpoint's serving
    config; True/False force it (scope stays the config's).

    ``mesh``: a 1-D 'data' jax.sharding.Mesh for multi-chip serving —
    params replicate, every engine batch shards over the data axis, so
    one BatchingEngine saturates a whole slice (the engine's fixed
    batch must divide the axis; same dp layout as produce_scores,
    train/loop.py).
    """
    import jax

    cfg, step, args = load_serving_parts(run_dir, checkpoint, int8=int8)

    # params ride as jit ARGUMENTS, not closure captures: captured
    # device arrays become compile-time constants, and constant-folding
    # a 300M-param tree stalls XLA for minutes (same mechanism as the
    # r4 sls_head_root_cause finding, BENCH_NOTES_r4)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sls_tpu.parallel.mesh import replicate

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        args = tuple(replicate(a, mesh) for a in args)
        # wav is the LAST positional arg of both step signatures
        step = jax.jit(
            step, in_shardings=tuple([repl] * len(args) + [data]))
    else:
        step = jax.jit(step)

    forward = lambda wav: step(*args, wav)  # noqa: E731
    return cfg, forward


def build_scorer(
    run_dir: str,
    checkpoint: Optional[str] = None,
    *,
    int8: Optional[bool] = None,
    wire_dtype: str = "float32",
    batch_size: int = 36,
    warmup: bool = True,
    mesh=None,
    bucket_sizes: Optional[tuple] = None,
) -> Tuple[object, Callable, int]:
    """(cfg, score_fn, cut) ready for BatchingEngine.

    ``warmup`` runs one throwaway batch PER SHAPE so the first real
    request pays dispatch latency, not the 20-40 s XLA compile.
    ``mesh``: dp-shard every engine batch over a 'data' mesh
    (batch_size must divide the axis; see load_serving_model).
    ``bucket_sizes``: extra smaller batch shapes the engine may
    dispatch (BatchingEngine bucket_sizes) — each is its own compile.
    """
    shapes = tuple(sorted(set(bucket_sizes or ()))) + (batch_size,)
    if mesh is not None:
        for s in shapes:
            if s % mesh.shape["data"]:
                raise ValueError(
                    f"batch shape {s} must be divisible by the mesh's "
                    f"data axis ({mesh.shape['data']}) for dp serving")
    cfg, forward = load_serving_model(run_dir, checkpoint, int8=int8,
                                      mesh=mesh)
    cut = cfg.train.cut_length
    if warmup:
        dtype = {"int16": jnp.int16, "mulaw": jnp.uint8}.get(
            wire_dtype, jnp.float32)
        for s in shapes:
            np.asarray(forward(jnp.zeros((s, cut), dtype)))
    return cfg, forward, cut
