"""Epoch-level training driver.

The reference's train/eval epoch machinery (reference: main.py:98-258,
714-776) rebuilt around jitted SPMD steps:

- on-device RawBoost augmentation per train batch (per-(epoch,batch) keys)
- online train/val EER from P(bonafide) scores (main.py:234-242)
- CSV training log + TensorBoard scalars (main.py:71-96, 744-750)
- last/best checkpointing with resume (CheckpointManager)
- quick_test batch caps (main.py:111-113)

One epoch/fit/score driver (``BaseTrainer``) serves every model family;
subclasses only supply the model, the jitted steps, and the state tree
(the reference grew a separate near-identical loop per model script —
main.py vs train_cpc.py — which this design deliberately collapses).
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sls_tpu.augment.rawboost import rawboost_batch
from sls_tpu.ckpt.checkpoint import CheckpointManager, load_checkpoint
from sls_tpu.config import ExperimentConfig, config_to_json
from sls_tpu.metrics.eer import roc_eer
from sls_tpu.models.detector import Detector
from sls_tpu.parallel import distributed as dist
from sls_tpu.parallel.distributed import (
    allgather_ragged_rows,
    allreduce_sum_scalars,
    global_batch,
    local_rows,
)
from sls_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_devices,
    replicate,
    shard_batch,
)
from sls_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

CSV_FIELDS = [
    "epoch", "train_loss", "train_cls_loss", "train_sae_loss", "train_cpc_loss",
    "train_acc", "train_eer", "val_loss", "val_acc", "val_eer", "val_sae_loss",
    "epoch_seconds",
]


class CSVLogger:
    """Append-per-epoch CSV, consumable by monitors/auto-resume logic
    (reference: main.py:71-96; train_window_topk.slurm:79-84)."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if not self.path.exists():
            with open(self.path, "w", newline="") as f:
                csv.DictWriter(f, CSV_FIELDS).writeheader()

    def log(self, row: Dict):
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, CSV_FIELDS).writerow(
                {k: row.get(k, "") for k in CSV_FIELDS}
            )

    def last_epoch(self) -> int:
        try:
            with open(self.path) as f:
                rows = list(csv.DictReader(f))
            return int(rows[-1]["epoch"]) if rows else -1
        except Exception:
            return -1


@dataclass
class EpochMetrics:
    loss: float = 0.0
    cls_loss: float = 0.0
    sae_loss: float = 0.0
    cpc_loss: float = 0.0
    acc: float = 0.0
    eer: float = 50.0


_FOLD_KEYS = ("loss", "cls_loss", "sae_loss", "cpc_loss", "correct",
              "finite")

# max train/eval steps in flight before a bounding sync (see
# train_epoch): deep enough that host prep and device compute fully
# overlap, shallow enough that the pinned input buffers stay ~100s of
# MB at production batch sizes
_PIPELINE_DEPTH = 8


def _local_scalars(metrics) -> dict:
    """This process's device-resident replica of each scalar metric.

    ``addressable_data(0)`` is a zero-copy view of the local shard (the
    scalars are replicated over the mesh) — NO host transfer — and it
    detaches the value from the global mesh so `_fold_metrics` runs as
    a plain single-device program on every process (mixing global-mesh
    arrays with process-local ones in one jit is invalid multi-host).
    Families that don't emit a loss component contribute 0.0."""
    out = {}
    for k in _FOLD_KEYS:
        v = metrics.get(k, 0.0)
        if hasattr(v, "addressable_data"):
            v = v.addressable_data(0)
        out[k] = v
    return out


@jax.jit
def _fold_metrics(acc, m, bsz):
    """One async device dispatch per train step: fold a step's scalar
    metrics into the epoch accumulator, masked by the step's finite
    flag (matching the old host-side `continue` semantics).  Cached at
    module scope so epochs don't recompile it."""
    ok = m["finite"].astype(jnp.float32)
    w = ok * bsz
    return {
        "loss": acc["loss"] + m["loss"] * w,
        "cls": acc["cls"] + m["cls_loss"] * w,
        "sae": acc["sae"] + m["sae_loss"] * w,
        "cpc": acc["cpc"] + m["cpc_loss"] * w,
        # correct is already the GLOBAL count (psum'd inside the train
        # step on every host) — folded as-is, NOT allreduced at the end
        "correct": acc["correct"] + m["correct"] * ok,
        "n": acc["n"] + w,
        "nonfinite": acc["nonfinite"] + (1.0 - ok),
    }


def _gathered_eer(scores_all: List[np.ndarray],
                  labels_all: List[np.ndarray]) -> float:
    """EER over per-host accumulated score/label rows: one ragged
    cross-host gather (identity single-process); 50% on an empty epoch
    (every batch rejected by the non-finite guard, or an empty loader)."""
    scores_cat = np.concatenate(scores_all) if scores_all else np.zeros(0)
    labels_cat = (
        np.concatenate(labels_all) if labels_all else np.zeros(0, np.int64)
    )
    scores_g = allgather_ragged_rows(scores_cat.astype(np.float32))
    labels_g = allgather_ragged_rows(labels_cat.astype(np.int32))
    return 50.0 if scores_g.size == 0 else float(roc_eer(scores_g, labels_g))


class BaseTrainer:
    """Single-controller SPMD epoch driver, shared by all model families.

    Subclasses implement ``_build_model_and_steps`` / ``_create_state`` /
    ``_state_tree`` / ``_restore_state`` / ``_run_eval`` and inherit the
    epoch loop, fit, resume chain and score emission.
    """

    log_prefix = ""

    def __init__(
        self,
        cfg: ExperimentConfig,
        run_dir,
        mesh=None,
        tensorboard: bool = True,
        profile_steps: int = 0,
    ):
        # profile_steps > 0: capture a jax.profiler trace of that many
        # steps at the start of the first trained epoch (SURVEY.md §5.1 —
        # the reference had no profiling subsystem at all)
        self.cfg = cfg
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        if mesh is not None:
            self.mesh = mesh
        elif cfg.train.model_parallel > 1:
            if jax.process_count() > 1:
                raise ValueError(
                    "model_parallel > 1 is single-host BY DESIGN: at "
                    "0.3B params the state fits one chip several times "
                    "over, so cross-host TP would trade a once-per-step "
                    "1.3 GB gradient all-reduce (DP, rides ICI) for "
                    "per-LAYER activation collectives over DCN — "
                    "strictly slower at every scale this model reaches. "
                    "Scale across hosts with data parallelism (see "
                    "README 'TPU-first design decisions')."
                )
            from sls_tpu.parallel.tensor import tp_mesh_and_config

            self.mesh, self.cfg = tp_mesh_and_config(cfg)
            cfg = self.cfg
        else:
            self.mesh = make_mesh()
        self.state_shardings = None  # set by subclasses for TP layouts
        # Multi-host: eval/scoring is embarrassingly parallel, so each
        # host runs it on a mesh of its OWN chips over its own data
        # shard — no lockstep constraint on per-host eval batch counts
        # (training keeps the global mesh; see parallel/distributed.py).
        self.eval_mesh = (
            self.mesh
            if jax.process_count() == 1
            else make_mesh(jax.local_devices())
        )
        # exactly one process writes checkpoints / CSV / TensorBoard
        self.io_primary = dist.is_primary()
        self._eval_params_cache = None  # (step, local-mesh params)
        self._build_model_and_steps()

        self.ckpt = CheckpointManager(self.run_dir, config_to_json(cfg))
        self.csv = (
            CSVLogger(self.run_dir / "training_log.csv")
            if self.io_primary
            else None
        )
        self.tb = None
        if tensorboard and self.io_primary:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(self.run_dir / "tb"))
            except Exception:
                self.tb = None

        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self.state = None
        self.start_epoch = 0
        self.profile_steps = profile_steps
        self._profiled = False
        self._nonfinite_batches = 0

    # -- subclass surface ----------------------------------------------------

    def _build_model_and_steps(self) -> None:
        raise TypeError("use Trainer or SLSTrainer, not BaseTrainer")

    def _create_state(self, sample_wav: jnp.ndarray):
        raise TypeError("use Trainer or SLSTrainer, not BaseTrainer")

    def _state_tree(self) -> Dict:
        raise TypeError("use Trainer or SLSTrainer, not BaseTrainer")

    def _restore_state(self, restored: Dict) -> None:
        raise TypeError("use Trainer or SLSTrainer, not BaseTrainer")

    def _run_eval(self, wav) -> Dict:
        raise TypeError("use Trainer or SLSTrainer, not BaseTrainer")

    def _resume_from_torch(self, path) -> bool:
        raise ValueError(
            f"no PyTorch checkpoint migration for {type(self).__name__}"
        )

    def _to_eval_mesh(self, tree):
        """Move a (params, ...) tuple onto the host-local eval mesh.

        Identity single-process.  Multi-host: params live replicated on
        the global mesh; evaluation runs on this host's local mesh, so
        fetch them once per optimizer step (cached) and re-place them
        locally — a host-local copy, no cross-host traffic.
        """
        if self.eval_mesh is self.mesh:
            return tree
        # cache key: optimizer step AND the params object identity —
        # resume()/migration replace params without advancing step, and
        # a stale cache would silently score with the old weights
        step = (
            int(jax.device_get(self.state.step))
            if hasattr(self.state, "step")
            else -1
        )
        leaf = jax.tree_util.tree_leaves(tree)[0]
        if self._eval_params_cache is not None:
            c_step, c_leaf, c_local = self._eval_params_cache
            # the cached source leaf is held strongly, so an `is` match
            # really is the same array (ids are never recycled here)
            if c_step == step and c_leaf is leaf:
                return c_local
        local = replicate(jax.device_get(tree), self.eval_mesh)
        self._eval_params_cache = (step, leaf, local)
        return local

    # -- state management ----------------------------------------------------

    def init_state(self, sample_wav: Optional[np.ndarray] = None) -> None:
        if sample_wav is None:
            sample_wav = np.zeros((2, self.cfg.train.cut_length), np.float32)
        state = self._create_state(jnp.asarray(sample_wav))
        if self.state_shardings is not None:
            from sls_tpu.parallel.tensor import place_state

            self.state = place_state(state, self.state_shardings)
        else:
            self.state = replicate(state, self.mesh)

    def resume(self, explicit_path=None, fresh_start: bool = False) -> bool:
        """Restore from the resume chain; returns True if resumed.

        Explicit paths ending in .pth/.pt are treated as reference PyTorch
        checkpoints and converted (weights-only migration path; reference
        checkpoints: main.py:753-764 with optional 'module.' prefixes;
        epoch inferred from the filename as in main.py:380-399).
        """
        if fresh_start:
            return False
        if explicit_path and str(explicit_path).endswith((".pth", ".pt")):
            return self._resume_from_torch(explicit_path)
        path = self.ckpt.resolve_resume(explicit_path)
        if path is None:
            return False
        assert self.state is not None, "call init_state() before resume()"
        restored, meta = load_checkpoint(path, self._state_tree())
        self._restore_state(restored)
        self.start_epoch = meta["epoch"] + 1
        return True

    def _torch_epoch_from(self, raw, path) -> None:
        """Set start_epoch from a torch checkpoint dict or its filename."""
        import re

        m = re.search(r"epoch[_-]?(\d+)", str(path))
        if isinstance(raw, dict) and "epoch" in raw:
            self.start_epoch = int(raw["epoch"]) + 1
        elif m:
            self.start_epoch = int(m.group(1)) + 1

    # -- epochs ----------------------------------------------------------------

    def train_epoch(self, loader, epoch: int) -> EpochMetrics:
        """One epoch of the hot loop — with NO per-step host sync.

        The r5 e2e ingest bench (bench_e2e_train.py) caught the
        original loop fetching ``finite`` + four loss floats + scores
        from the device EVERY step, serializing host-side prep (decode
        fetch, pad, upload, RawBoost dispatch) against device compute:
        81.5 utts/s end-to-end against 212.5 device-only at b64.  Now
        every per-step metric stays ON DEVICE — scalars fold into a
        device-resident accumulator through a tiny jitted add (one
        dispatch, no fetch), score rows and finite flags accumulate as
        device arrays — and the single host fetch happens at epoch end.
        The non-finite state rejection is compiled INTO the train step
        (steps.py: the whole state transition is where'd on finite), so
        deferring the WARNING costs nothing in correctness; warnings
        print at epoch end with batch indices.
        """
        assert self.state is not None
        aug_cfg = self.cfg.train.rawboost
        # device-resident epoch accumulator (this PROCESS's partial
        # sums, matching the old host-side Python sums — cross-host
        # reduction stays in _combine_epoch).  fp32 epoch sums at
        # < 1e5 steps lose < 1e-3 relative — logging, not optimizer
        # state (TPUs run x64-disabled).
        accum = {k: jnp.zeros((), jnp.float32)
                 for k in ("loss", "cls", "sae", "cpc", "correct",
                           "n", "nonfinite")}

        # per-step device arrays, fetched once after the loop
        step_scores: List = []   # [B] score rows (device)
        step_finite: List = []   # [] bool (device)
        step_meta: List = []     # (labels_np, valid, b_idx) host-side

        profiling = False
        for b_idx, batch in enumerate(loader.epoch(epoch)):
            if (self.profile_steps and not self._profiled and b_idx == 1):
                jax.profiler.start_trace(str(self.run_dir / "profile"))
                profiling = True
            wav_np, labels_np, valid = pad_batch_to_devices(
                self.mesh, batch.wav, batch.labels, batch.valid
            )
            wav = jnp.asarray(wav_np)
            if aug_cfg.algo in range(1, 9):
                if wav.dtype != jnp.float32:
                    # RawBoost filters float audio; dequantize any
                    # quantized wire (int16 or mu-law uint8) on device
                    # before augmenting (one fused op)
                    from sls_tpu.train.steps import dequantize_wire

                    wav = dequantize_wire(wav)
                # key folds in process_index so hosts draw decorrelated
                # augmentations for their disjoint data shards
                aug_key = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.fold_in(self.rng, jax.process_index()),
                        epoch,
                    ),
                    b_idx,
                )
                wav = rawboost_batch(aug_key, wav, aug_cfg)
            wav, labels, valid_dev = global_batch(
                (wav, jnp.asarray(labels_np), jnp.asarray(valid)), self.mesh
            )
            self.state, metrics = self.train_step(
                self.state, wav, labels, valid_dev, self.rng
            )
            # NO host fetch here: fold scalars into the device
            # accumulator (one async dispatch) and keep score rows /
            # finite flags as device arrays for the epoch-end fetch.
            accum = _fold_metrics(accum, _local_scalars(metrics),
                                  float(valid.sum()))
            step_scores.append(metrics["scores"])
            step_finite.append(metrics["finite"])
            step_meta.append((labels_np, valid, b_idx))
            # BOUNDED pipelining: unbounded async dispatch would pin
            # every queued step's wav upload buffer in HBM (b64 fp32 =
            # 16.5 MB/step -> GBs over a long epoch).  A tiny scalar
            # fetch PIPELINE_DEPTH steps behind bounds in-flight work
            # (device execution is in-order) at ~one small round-trip
            # per DEPTH steps — amortized noise, even on the relay.
            if (b_idx >= _PIPELINE_DEPTH
                    and b_idx % _PIPELINE_DEPTH == 0):
                jax.device_get(step_finite[b_idx - _PIPELINE_DEPTH])
            if profiling and b_idx >= self.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                self._profiled = True

        if profiling:
            jax.profiler.stop_trace()
            self._profiled = True

        # the epoch's single device->host sync: accumulator + finite
        # flags in one fetch, then only the LOCAL rows of each score
        # array (local_rows — this host's shard, no cross-host traffic)
        acc, finite_flags = jax.device_get((accum, step_finite))
        scores_all: List[np.ndarray] = []
        labels_all: List[np.ndarray] = []
        for ok, scores, (labels_np, valid, b_idx) in zip(
            finite_flags, step_scores, step_meta
        ):
            if not bool(ok):
                # the jitted step already rejected the state transition
                # (params/moments/batch_stats kept); the batch also
                # contributes nothing to epoch averages (fold masked it)
                self._nonfinite_batches += 1
                print(f"WARNING: non-finite loss at batch {b_idx} "
                      f"(epoch {epoch}); update was rejected in-step",
                      flush=True)
                continue
            s = local_rows(scores)[valid]
            scores_all.append(s)
            labels_all.append(labels_np[valid])

        sums = {"loss": float(acc["loss"]), "cls": float(acc["cls"]),
                "sae": float(acc["sae"]), "cpc": float(acc["cpc"]),
                "correct": float(acc["correct"])}
        # one cross-host reduction per epoch: weighted loss sums plus a
        # ragged gather of the per-host score/label rows
        return self._combine_epoch(sums, int(acc["n"]), scores_all,
                                   labels_all)

    def _combine_epoch(self, sums, n_seen, scores_all, labels_all):
        loss_s, cls_s, sae_s, cpc_s, n_g = allreduce_sum_scalars(
            [sums["loss"], sums["cls"], sums["sae"], sums["cpc"],
             float(n_seen)]
        )
        n = max(float(n_g), 1.0)
        return EpochMetrics(
            loss=float(loss_s) / n, cls_loss=float(cls_s) / n,
            sae_loss=float(sae_s) / n, cpc_loss=float(cpc_s) / n,
            acc=100.0 * float(sums["correct"]) / n,
            eer=_gathered_eer(scores_all, labels_all),
        )

    def validate(self, loader) -> EpochMetrics:
        assert self.state is not None
        from sls_tpu.train.loss import weighted_nll

        n_seen = 0
        loss_sum = 0.0
        sae_sum = 0.0
        correct = 0.0
        scores_all: List[np.ndarray] = []
        labels_all: List[np.ndarray] = []
        # dispatch the whole pass first (device pipelines through JAX
        # async dispatch; the old per-batch np.asarray sync serialized
        # host prep against device compute — same fix as train_epoch),
        # then drain once
        pending = []
        fetched = []
        for batch in loader.epoch(0):
            wav_np, labels_np, valid = pad_batch_to_devices(
                self.eval_mesh, batch.wav, batch.labels, batch.valid
            )
            wav = shard_batch(jnp.asarray(wav_np), self.eval_mesh)
            out = self._run_eval(wav)
            kept = {k: out[k] for k in
                    ("log_probs", "score", "sae_loss_per_example",
                     "sae_loss") if k in out}
            pending.append((kept, labels_np, valid))
            if len(pending) > _PIPELINE_DEPTH:
                # windowed drain: fetch the oldest result (device is
                # DEPTH batches ahead) — keeps the pipeline full while
                # bounding pinned wav upload buffers
                k0, l0, v0 = pending.pop(0)
                fetched.append((jax.device_get(k0), l0, v0))
        fetched.extend(
            (jax.device_get(k0), l0, v0) for k0, l0, v0 in pending)
        for out, labels_np, valid in fetched:
            logp = np.asarray(out["log_probs"])
            s = np.asarray(out["score"])
            v = valid
            batch_labels = labels_np
            bsz = int(v.sum())
            n_seen += bsz
            loss_sum += float(
                weighted_nll(
                    jnp.asarray(logp[v]), jnp.asarray(batch_labels[v]),
                    self.cfg.train.loss_weights,
                )
            ) * bsz
            if "sae_loss_per_example" in out:
                sae_sum += float(
                    np.asarray(out["sae_loss_per_example"])[v].sum()
                )
            else:
                sae_sum += float(out.get("sae_loss", 0.0)) * bsz
            correct += float((np.argmax(logp[v], -1) == batch_labels[v]).sum())
            scores_all.append(s[v])
            labels_all.append(batch_labels[v])

        # cross-host reduction: each host validated its own data shard
        # on its local mesh (hosts may run different batch counts), so
        # sums and score vectors are combined here, once per epoch
        loss_sum, sae_sum, correct, n_seen = allreduce_sum_scalars(
            [loss_sum, sae_sum, correct, float(n_seen)]
        )
        n = max(float(n_seen), 1.0)
        return EpochMetrics(
            loss=float(loss_sum) / n, sae_loss=float(sae_sum) / n,
            acc=100.0 * float(correct) / n,
            eer=_gathered_eer(scores_all, labels_all),
        )

    def fit(self, train_loader, val_loader, num_epochs: Optional[int] = None):
        """Full training run with per-epoch checkpointing and logging."""
        assert self.state is not None, "call init_state() (and resume()) first"
        num_epochs = num_epochs or self.cfg.train.num_epochs
        for epoch in range(self.start_epoch, num_epochs):
            t0 = time.time()
            tr = self.train_epoch(train_loader, epoch)
            va = self.validate(val_loader)
            dt = time.time() - t0

            row = {
                "epoch": epoch,
                "train_loss": f"{tr.loss:.6f}",
                "train_cls_loss": f"{tr.cls_loss:.6f}",
                "train_sae_loss": f"{tr.sae_loss:.6f}",
                "train_cpc_loss": f"{tr.cpc_loss:.6f}",
                "train_acc": f"{tr.acc:.3f}",
                "train_eer": f"{tr.eer:.4f}",
                "val_loss": f"{va.loss:.6f}",
                "val_acc": f"{va.acc:.3f}",
                "val_eer": f"{va.eer:.4f}",
                "val_sae_loss": f"{va.sae_loss:.6f}",
                "epoch_seconds": f"{dt:.1f}",
            }
            if self.csv is not None:
                self.csv.log(row)
            if self.tb is not None:
                for key, value in [
                    ("train/loss", tr.loss), ("train/eer", tr.eer),
                    ("train/acc", tr.acc), ("train/sae_loss", tr.sae_loss),
                    ("val/loss", va.loss), ("val/eer", va.eer),
                    ("val/acc", va.acc),
                ]:
                    self.tb.add_scalar(key, value, epoch)

            if self.io_primary:
                # async write: the host fetch is synchronous (the next
                # train step donates the device buffers) but msgpack
                # serialization + atomic writes overlap the next epoch
                improved = self.ckpt.save_epoch(
                    self._state_tree(), epoch,
                    {"val_eer": va.eer, "val_loss": va.loss, "val_acc": va.acc},
                    block=False,
                )
                marker = " *best*" if improved else ""
                print(
                    f"{self.log_prefix}epoch {epoch}: train_loss={tr.loss:.4f} "
                    f"train_eer={tr.eer:.2f}% val_eer={va.eer:.2f}%"
                    f" ({dt:.1f}s){marker}",
                    flush=True,
                )
            # non-primary hosts wait for the epoch boundary so hosts
            # stay in lockstep entering the next epoch
            dist.sync_hosts("epoch-ckpt")
        self.ckpt.wait()  # join the last async checkpoint write

    # -- scoring ----------------------------------------------------------------

    def produce_scores(self, loader, out_path) -> int:
        """Emit the `utt score` file for a track's eval set
        (reference: main.py:158-199)."""
        from sls_tpu.scores.writer import ScoreWriter

        assert self.state is not None
        # Multi-host: each host scores its own shard of the eval index
        # (see DatasetIndex.host_shard) on its local mesh and writes a
        # part file; the primary concatenates them at the end.
        n = 0
        with ScoreWriter(dist.part_path(out_path)) as writer:
            pending = []  # windowed pipeline (r5, see train_epoch):
            # host decode, device compute, and score writing overlap;
            # a 2-deep window also absorbs per-batch decode jitter
            # that a single in-flight slot would pass to the device

            def flush(item):
                nonlocal n
                utt_ids, valid, out = item
                # score-file contract: P(bonafide) = exp(log_softmax)[:, 1]
                # (reference: main.py:183-185); exponentiated in float64 so
                # confident trials don't collapse into 1.0 float32 ties
                logp = np.asarray(out["log_probs"])  # blocks on the device
                # float32 log_softmax can round to tiny POSITIVE values for
                # p ~ 1; clamp so the score contract stays within [0, 1]
                score = np.exp(np.minimum(logp, 0.0).astype(np.float64))[:, 1]
                writer.write_batch(
                    [u for u, ok in zip(utt_ids, valid) if ok], score[valid]
                )
                n += int(valid.sum())

            for batch in loader.epoch(0):
                wav_np, _, valid = pad_batch_to_devices(
                    self.eval_mesh, batch.wav, None, batch.valid
                )
                wav = shard_batch(jnp.asarray(wav_np), self.eval_mesh)
                out = self._run_eval(wav)  # async
                utt_ids = list(batch.utt_ids) + [""] * (len(valid) - len(batch.utt_ids))
                pending.append((utt_ids, valid, out))
                if len(pending) > 2:
                    flush(pending.pop(0))
            for item in pending:
                flush(item)
        dist.merge_part_files(out_path)
        return int(allreduce_sum_scalars([float(n)])[0])


class Trainer(BaseTrainer):
    """SPMD trainer for the SAE Detector families (per-timestep / window /
    CPC / frozen-SSL)."""

    def _build_model_and_steps(self) -> None:
        self.model = Detector(self.cfg.model)
        params_sh = None
        if self.cfg.train.model_parallel > 1:
            from sls_tpu.parallel.tensor import state_shardings

            state_shape = jax.eval_shape(
                lambda key, w: create_train_state(
                    self.model, self.cfg, key, w
                ),
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct(
                    (2, self.cfg.train.cut_length), jnp.float32
                ),
            )
            self.state_shardings = state_shardings(state_shape, self.mesh)
            params_sh = "inherit"
        self.train_step = make_train_step(
            self.model, self.cfg, self.mesh,
            "inherit" if self.state_shardings is not None else None,
        )
        # single-process: eval_mesh is the train mesh, so the TP params
        # layout carries over; multi-host TP is rejected in __init__
        self.eval_step = make_eval_step(
            self.model, self.cfg, self.eval_mesh, params_sh
        )

    def _create_state(self, sample_wav: jnp.ndarray) -> TrainState:
        return create_train_state(self.model, self.cfg, self.rng, sample_wav)

    def _state_tree(self):
        return {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }

    def _restore_state(self, restored) -> None:
        if self.state_shardings is not None:
            from sls_tpu.parallel.tensor import place_state

            self.state = self.state.replace(
                params=place_state(
                    restored["params"], self.state_shardings.params
                ),
                opt_state=place_state(
                    restored["opt_state"], self.state_shardings.opt_state
                ),
                step=jnp.asarray(restored["step"]),
            )
            return
        self.state = self.state.replace(
            params=replicate(restored["params"], self.mesh),
            opt_state=replicate(restored["opt_state"], self.mesh),
            step=jnp.asarray(restored["step"]),
        )

    def _run_eval(self, wav):
        (params,) = self._to_eval_mesh((self.state.params,))
        return self.eval_step(params, wav)

    def _resume_from_torch(self, path) -> bool:
        """Weights-only restore from a reference PyTorch checkpoint."""
        import torch

        from sls_tpu.encoder.convert import detector_state_to_flax

        assert self.state is not None, "call init_state() before resume()"
        raw = torch.load(path, map_location="cpu", weights_only=True)
        state = raw.get("model", raw) if isinstance(raw, dict) else raw
        state = {k: np.asarray(v) for k, v in state.items()}
        params = detector_state_to_flax(state, self.cfg.model)
        self.state = self.state.replace(
            params=replicate(params, self.mesh)
        )
        self._torch_epoch_from(raw, path)
        return True
