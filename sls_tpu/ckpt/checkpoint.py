"""Checkpointing: atomic last/best saves and the resume chain.

Re-provides the reference's checkpoint semantics (reference:
main.py:338-399, 542-627, 752-776) on a flax/optax state pytree:

- dict checkpoints carrying params, optimizer state, epoch, metrics and
  the full serialized config (checkpoint-as-config idiom)
- atomic writes via tmp file + os.replace (torn-file safety)
- ``last.ckpt`` every epoch + ``best.ckpt`` on val-EER improvement
- resume priority: explicit path > last > best
- params-only loading for eval/analysis tools

Format: flax msgpack serialization (single-host).  Multi-host/sharded
async checkpointing can swap in orbax behind the same interface.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import numpy as np
from flax import serialization

PathLike = Union[str, Path]

LAST_NAME = "last.ckpt"
BEST_NAME = "best.ckpt"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: PathLike,
    state_tree: Any,
    *,
    epoch: int,
    metrics: Optional[Dict[str, float]] = None,
    config_json: Optional[str] = None,
) -> None:
    """Atomically serialize a checkpoint dict to ``path``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = {
        "epoch": epoch,
        "metrics": metrics or {},
        "config_json": config_json or "",
    }
    # to_state_dict flattens namedtuple optimizer states into plain dicts
    state_dict = serialization.to_state_dict(_to_host(state_tree))
    blob = serialization.msgpack_serialize(
        {"state": state_dict, "meta": _meta_to_arrays(meta)}
    )
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _meta_to_arrays(meta: Dict[str, Any]) -> Dict[str, Any]:
    """Meta dict -> msgpack-friendly form (scalars + json strings).

    Metric values may arrive as numpy scalars (e.g. from cross-host
    reductions); coerce to plain floats so json accepts them.
    """
    metrics = {k: float(v) for k, v in meta["metrics"].items()}
    return {
        "epoch": np.asarray(meta["epoch"], np.int64),
        "metrics_json": json.dumps(metrics),
        "config_json": meta["config_json"],
    }


def _conform_state_dict(raw, tmpl):
    """Recursively conform a legacy raw state dict to a template's
    state-dict shape: wrap a bare optimizer chain where the template
    expects optax.MaskedState ({'inner_state': ...}) and drop raw keys
    the template no longer carries (moments of frozen params, which
    serialize as empty dicts under MaskedNode).  Keys the template has
    but raw lacks are left to from_state_dict to report."""
    if isinstance(tmpl, dict):
        if not tmpl:
            # MaskedNode serializes as an empty dict: whatever the old
            # checkpoint stored here (a frozen leaf's moments) is gone
            return {}
        if isinstance(raw, dict):
            if set(tmpl) == {"inner_state"} and set(raw) != {"inner_state"}:
                raw = {"inner_state": raw}
            return {
                k: _conform_state_dict(raw[k], v)
                for k, v in tmpl.items()
                if k in raw
            }
    return raw


def load_checkpoint(
    path: PathLike, state_template: Optional[Any] = None
) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint.  With ``state_template`` the state is restored
    into the template's pytree structure (shape-checked); without it the
    raw nested dict is returned.

    Returns (state, meta) where meta has epoch / metrics / config_json.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    state = raw["state"]
    if state_template is not None:
        try:
            state = serialization.from_state_dict(state_template, state)
        except ValueError:
            # pre-masked-optimizer checkpoints: freeze_encoder runs
            # saved before the optimizer was wrapped in optax.masked
            # carry a bare chain state where the template now expects
            # MaskedState({'inner_state': ...}) with the frozen
            # subtree's moments absent.  Conform the raw dict to the
            # template's shape (wrap, then drop the now-maskless
            # moments) and retry; anything else re-raises.
            adapted = _conform_state_dict(
                state, serialization.to_state_dict(state_template))
            state = serialization.from_state_dict(state_template, adapted)
            print(f"[ckpt] migrated pre-masked-optimizer state from "
                  f"{path} (frozen-subtree moments dropped)")
    meta_raw = raw.get("meta", {})
    meta = {
        "epoch": int(meta_raw.get("epoch", 0)),
        "metrics": json.loads(meta_raw.get("metrics_json", "{}")),
        "config_json": meta_raw.get("config_json", ""),
    }
    return state, meta


class CheckpointManager:
    """last/best checkpoint management for a run directory."""

    def __init__(self, run_dir: PathLike, config_json: str = ""):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.config_json = config_json
        self.best_metric: Optional[float] = None
        self._writer = None  # in-flight async write thread
        self._writer_error: Optional[BaseException] = None
        self._load_best_metric()

    @property
    def last_path(self) -> Path:
        return self.run_dir / LAST_NAME

    @property
    def best_path(self) -> Path:
        return self.run_dir / BEST_NAME

    def _load_best_metric(self) -> None:
        if self.best_path.exists():
            try:
                _, meta = load_checkpoint(self.best_path)
                self.best_metric = meta["metrics"].get("val_eer")
            except Exception:
                self.best_metric = None

    def save_epoch(
        self,
        state_tree: Any,
        epoch: int,
        metrics: Dict[str, float],
        best_key: str = "val_eer",
        lower_is_better: bool = True,
        block: bool = True,
    ) -> bool:
        """Save ``last``; promote to ``best`` if ``metrics[best_key]``
        improved.  Returns True when a new best was recorded.

        ``block=False`` materializes the state on the host synchronously
        (the NEXT train step donates the device buffers, so the device→
        host fetch cannot be deferred) but runs serialization + atomic
        writes on a background thread, keeping the msgpack/fsync cost —
        doubled on best-epochs — off the training critical path.  At
        most one write is in flight; call :meth:`wait` (done by
        Trainer.fit on exit) before reading the files back.
        """
        value = metrics.get(best_key)
        improved = value is not None and (
            self.best_metric is None
            or (value < self.best_metric
                if lower_is_better else value > self.best_metric)
        )
        if improved:
            self.best_metric = value

        def write(host_tree):
            save_checkpoint(
                self.last_path, host_tree, epoch=epoch, metrics=metrics,
                config_json=self.config_json,
            )
            if improved:
                save_checkpoint(
                    self.best_path, host_tree, epoch=epoch, metrics=metrics,
                    config_json=self.config_json,
                )

        if block:
            write(state_tree)
        else:
            import threading

            host_tree = _to_host(state_tree)  # sync fetch: see docstring
            self.wait()  # raises if the PREVIOUS async write failed

            def guarded_write(tree):
                try:
                    write(tree)
                except BaseException as e:  # surfaced by the next wait()
                    self._writer_error = e

            self._writer = threading.Thread(
                target=guarded_write, args=(host_tree,), daemon=True,
                name="ckpt-writer",
            )
            self._writer.start()
        return improved

    def wait(self) -> None:
        """Join any in-flight async checkpoint write.

        Re-raises an exception from the background writer (ENOSPC, NFS
        error, …): a silent failure would leave last/best stale while
        ``best_metric`` has already advanced, so the epoch would never
        be re-promoted.  Callers (next save_epoch / fit-exit /
        resolve_resume) must see the failure."""
        if self._writer is not None:
            self._writer.join()
            self._writer = None
        if self._writer_error is not None:
            err, self._writer_error = self._writer_error, None
            raise RuntimeError(
                "async checkpoint write failed; last/best on disk may be "
                "stale"
            ) from err

    def resolve_resume(
        self, explicit: Optional[PathLike] = None
    ) -> Optional[Path]:
        """Resume priority: explicit path > last > best
        (reference: main.py:345-377)."""
        self.wait()  # an async write may still be materializing 'last'
        if explicit:
            p = Path(explicit)
            if p.exists():
                return p
            raise FileNotFoundError(
                f"--resume checkpoint not found: {p}\n"
                + self.describe_available()
            )
        for candidate in (self.last_path, self.best_path):
            if candidate.exists():
                return candidate
        return None

    def describe_available(self) -> str:
        """Human-readable table of checkpoints in the run dir with their
        epoch/metrics (reference: main.py:297-335
        ``list_available_checkpoints``)."""
        ckpts = sorted(self.run_dir.glob("*.ckpt"))
        if not ckpts:
            return f"no checkpoints found in: {self.run_dir}"
        lines = [f"available checkpoints in {self.run_dir}:"]
        for p in ckpts:
            try:
                _, meta = load_checkpoint(p)
                parts = [f"epoch {meta['epoch']}"]
                for k, v in sorted(meta.get("metrics", {}).items()):
                    parts.append(f"{k}={v:.4g}")
                lines.append(f"  {p.name}: " + ", ".join(parts))
            except Exception as e:
                lines.append(f"  {p.name}: unreadable ({e})")
        return "\n".join(lines)
