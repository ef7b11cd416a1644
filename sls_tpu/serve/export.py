"""Deployment artifacts: the serving forward as serialized StableHLO.

``jax.export`` captures the jitted ``(params, wav) -> log_probs``
program as a versioned, self-describing artifact that reloads WITHOUT
the model code: a deployment host needs jax and this directory — not
the model zoo, the config system, or the checkpoint loader.  The
reference cannot ship this at all: its deployment story is "copy the
``.pth`` AND the matching ``model_*.py`` source next to it"
(reference: main.py:753-764 checkpoint dicts + the checkpoint-shape
architecture sniffing in eval_2021_LA_torchaudio.py:138-144); here the
architecture IS the artifact.

Artifact = a directory:

    manifest.json   shapes, wire dtype, family, platforms, versions
    forward.shlo    ``jax.export`` serialized bytes (StableHLO)
    params.msgpack  flax msgpack tree of the non-wav step arguments

Design choices:

- STATIC batch: the batching engine dispatches a fixed batch anyway
  (serve/engine.py), and a static shape keeps the whole program — incl.
  Pallas kernels, which reject symbolic dims — exportable.
- The int8 / wire decisions are baked at export time and recorded in
  the manifest; the loader enforces them loudly instead of silently
  recompiling (an exported program CANNOT retrace).
- Multi-platform lowering (``platforms=("tpu", "cpu")``) lets one
  artifact serve on TPU and be integration-tested on CPU hosts.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

MANIFEST_NAME = "manifest.json"
PROGRAM_NAME = "forward.shlo"
PARAMS_NAME = "params.msgpack"
FORMAT_VERSION = 1

# wire dtype name -> numpy dtype of the on-wire batch (train/steps.py
# dequantize_wire dispatches on the traced dtype)
WIRE_NUMPY = {"float32": np.float32, "int16": np.int16, "mulaw": np.uint8}


def export_serving(
    run_dir: str,
    out_dir: str,
    *,
    batch_size: int = 36,
    wire_dtype: str = "float32",
    int8: Optional[bool] = None,
    checkpoint: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Serialize ``run_dir``'s serving forward into ``out_dir``.

    Returns the manifest dict.  ``platforms=None`` exports for the
    current default backend only; pass e.g. ``("tpu", "cpu")`` for a
    multi-platform artifact.
    """
    import jax
    from flax import serialization
    from jax import export as jexport

    from sls_tpu.config import config_to_json
    from sls_tpu.serve.scorer import load_serving_parts

    if wire_dtype not in WIRE_NUMPY:
        raise ValueError(
            f"unknown wire_dtype {wire_dtype!r}; one of {sorted(WIRE_NUMPY)}")

    cfg, step, args = load_serving_parts(run_dir, checkpoint, int8=int8)
    cut = int(cfg.train.cut_length)
    args = jax.tree.map(np.asarray, args)
    wav_spec = jax.ShapeDtypeStruct(
        (batch_size, cut), WIRE_NUMPY[wire_dtype])
    arg_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
    exported = jexport.export(
        jax.jit(step), platforms=tuple(platforms) if platforms else None,
    )(*arg_specs, wav_spec)

    manifest = {
        "format_version": FORMAT_VERSION,
        "family": "sls" if len(args) == 2 else "detector",
        "n_args": len(args),
        "batch_size": batch_size,
        "cut": cut,
        "wire_dtype": wire_dtype,
        "int8_serving": bool(cfg.model.encoder.int8_serving),
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "jax_version": jax.__version__,
        "config": json.loads(config_to_json(cfg)),
    }

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / PROGRAM_NAME).write_bytes(bytes(exported.serialize()))
    # to_state_dict flattens the tuple into {"0": ..., "1": ...}; the
    # loader rebuilds positional args from manifest n_args
    blob = serialization.msgpack_serialize(
        {"args": serialization.to_state_dict(args)})
    (out / PARAMS_NAME).write_bytes(blob)
    (out / MANIFEST_NAME).write_text(json.dumps(manifest, indent=1))
    return manifest


def load_exported(out_dir: str):
    """(manifest, forward) from an export_serving directory.

    ``forward(wav_wire [batch, cut]) -> log_probs [batch, 2]``; the
    wire shape/dtype are FIXED at export time and validated per call
    (an exported program cannot retrace for new shapes).  Params are
    device_put once at load so per-request calls don't re-transfer the
    300M-param tree.
    """
    import jax
    from flax import serialization
    from jax import export as jexport

    out = Path(out_dir)
    manifest = json.loads((out / MANIFEST_NAME).read_text())
    if manifest.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported artifact format_version "
            f"{manifest.get('format_version')!r} (loader speaks "
            f"{FORMAT_VERSION})")
    exported = jexport.deserialize(
        bytearray((out / PROGRAM_NAME).read_bytes()))
    restored = serialization.msgpack_restore((out / PARAMS_NAME).read_bytes())
    args = jax.device_put(
        tuple(restored["args"][str(i)] for i in range(manifest["n_args"])))

    call = jax.jit(exported.call)
    batch, cut = int(manifest["batch_size"]), int(manifest["cut"])
    wire = np.dtype(WIRE_NUMPY[manifest["wire_dtype"]])

    def forward(wav):
        shape, dtype = np.shape(wav), np.asarray(wav).dtype
        if shape != (batch, cut) or dtype != wire:
            raise ValueError(
                f"exported program is fixed at wav[{batch}, {cut}] "
                f"{wire.name} (wire={manifest['wire_dtype']}); got "
                f"{list(shape)} {dtype.name}. Re-export for other "
                f"shapes, or route through data/pipeline.to_wire.")
        return call(*args, wav)

    return manifest, forward


def build_scorer_from_export(
    out_dir: str, *, warmup: bool = True,
) -> Tuple[dict, object, int]:
    """(manifest, score_fn, cut) ready for BatchingEngine — the
    exported-artifact counterpart of scorer.build_scorer.  The engine
    MUST be built with the manifest's batch_size and wire_dtype; the
    caller gets them from the returned manifest."""
    manifest, forward = load_exported(out_dir)
    if warmup:
        wav = np.zeros(
            (manifest["batch_size"], manifest["cut"]),
            WIRE_NUMPY[manifest["wire_dtype"]])
        np.asarray(forward(wav))
    return manifest, forward, int(manifest["cut"])
