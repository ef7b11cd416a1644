"""XLS-R + SLS detector — the upstream parity model family.

This is BASELINE config #1 ("XLS-R-300M frozen + SLS head"): the model
whose published numbers (EER 1.92% DF / 2.87% LA, reference README.md:84-86)
the TPU build must reproduce.  Architecture: XLS-R encoder with all
per-layer hidden states -> SLS layer-gated fusion head.

Carries BatchNorm running statistics, so train steps thread the
``batch_stats`` collection; the step builders here mirror
sls_tpu.train.steps with that addition.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sls_tpu.config import ExperimentConfig, ModelConfig
from sls_tpu.encoder.xlsr import XLSREncoder
from sls_tpu.heads.sls import SLSHead
from sls_tpu.train.loss import weighted_nll
from sls_tpu.train.steps import make_optimizer
from flax import linen as nn


class SLSDetector(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        encoder = XLSREncoder(self.config.encoder, name="encoder")
        final, hiddens = encoder(wav, train=train, return_hidden_states=True)
        stacked = jnp.stack(hiddens, axis=0)  # [L, B, T, C]
        log_probs = SLSHead(name="sls_head")(stacked, train=train)
        return {
            "log_probs": log_probs,
            "score": jnp.exp(log_probs[:, 1]),
            "features": final.astype(jnp.float32),
        }


class SLSTrainState(train_state.TrainState):
    batch_stats: Dict = None


def create_sls_train_state(
    model: SLSDetector, cfg: ExperimentConfig, rng: jax.Array,
    sample_wav: jnp.ndarray,
) -> SLSTrainState:
    # jitted init: one compiled program instead of thousands of small
    # dispatches (matters on relayed backends; 156s -> ~25s at 300M)
    init_fn = jax.jit(
        lambda key: model.init(
            {"params": key, "dropout": jax.random.fold_in(key, 1)},
            sample_wav, train=False,
        )
    )
    variables = init_fn(rng)
    return SLSTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg.train.lr, cfg.train.weight_decay),
    )


def make_sls_train_step(
    model: SLSDetector, cfg: ExperimentConfig, mesh: Optional[Mesh] = None
) -> Callable:
    tcfg = cfg.train

    def step(state: SLSTrainState, wav, labels, valid, base_rng):
        dropout_rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                wav, train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss = weighted_nll(
                out["log_probs"], labels, tcfg.loss_weights, valid
            )
            return loss, (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
        metrics = {
            "loss": loss,
            "scores": out["score"],
            "correct": ((jnp.argmax(out["log_probs"], -1) == labels)
                        * valid).sum(),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(repl, data, data, data, repl),
                   out_shardings=(repl, None))


def make_sls_eval_step(
    model: SLSDetector, mesh: Optional[Mesh] = None
) -> Callable:
    def step(params, batch_stats, wav):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, wav, train=False
        )
        return {"score": out["score"], "log_probs": out["log_probs"]}

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, repl, data), out_shardings=None)


class _GateProbe(nn.Module):
    """Capture the SLS head's sigmoid layer gates (see layer_gate_profile)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        encoder = XLSREncoder(self.config.encoder, name="encoder")
        _, hiddens = encoder(wav, train=False, return_hidden_states=True)
        stacked = jnp.stack(hiddens, axis=0).astype(jnp.float32)
        pooled = stacked.mean(axis=2)  # [L, B, C]
        gate = jax.nn.sigmoid(
            nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="layer_gate")(pooled)
        )
        return gate[..., 0]  # [L, B]


def layer_gate_profile(model: SLSDetector, params, batch_stats, wav) -> Dict:
    """Which encoder layers does the SLS head consider sensitive?

    Returns per-layer mean/std of the sigmoid layer gates over a batch —
    the interpretability question the SLS architecture exists to answer
    (layer-gated fusion in heads/sls.py).  ``batch_stats`` is unused (the
    gates sit before the BatchNorm) but kept for API symmetry.
    """
    import numpy as np

    probe = _GateProbe(model.config)
    probe_params = {
        "encoder": params["encoder"],
        "layer_gate": params["sls_head"]["layer_gate"],
    }
    gates = np.asarray(
        jax.jit(lambda p, w: probe.apply({"params": p}, w))(probe_params, wav)
    )
    return {
        "mean_gate_per_layer": gates.mean(axis=1).tolist(),
        "std_gate_per_layer": gates.std(axis=1).tolist(),
        "most_sensitive_layers": np.argsort(-gates.mean(axis=1))[:5].tolist(),
    }


class SLSTrainer:
    """Epoch driver for the SLS parity model — the Trainer's contract
    (fit / validate / produce_scores / resume) with batch_stats threading.

    Reuses the CSV logger, checkpoint manager and device-padding helpers;
    the loss is plain weighted NLL (no SAE/CPC terms)."""

    def __init__(self, cfg: ExperimentConfig, run_dir, mesh=None,
                 tensorboard: bool = False):
        import numpy as np
        from pathlib import Path

        from sls_tpu.ckpt.checkpoint import CheckpointManager
        from sls_tpu.config import config_to_json
        from sls_tpu.parallel.mesh import make_mesh
        from sls_tpu.train.loop import CSVLogger

        self.cfg = cfg
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = SLSDetector(cfg.model)
        self.train_step = make_sls_train_step(self.model, cfg, self.mesh)
        self.eval_step = make_sls_eval_step(self.model, self.mesh)
        self.ckpt = CheckpointManager(self.run_dir, config_to_json(cfg))
        self.csv = CSVLogger(self.run_dir / "training_log.csv")
        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self.state: Optional[SLSTrainState] = None
        self.start_epoch = 0

    def init_state(self, sample_wav=None):
        import numpy as np
        from sls_tpu.parallel.mesh import replicate

        if sample_wav is None:
            sample_wav = np.zeros((2, self.cfg.train.cut_length), np.float32)
        state = create_sls_train_state(
            self.model, self.cfg, self.rng, jnp.asarray(sample_wav)
        )
        self.state = replicate(state, self.mesh)

    def _state_tree(self):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }

    def resume(self, explicit_path=None, fresh_start=False) -> bool:
        from sls_tpu.ckpt.checkpoint import load_checkpoint
        from sls_tpu.parallel.mesh import replicate

        if fresh_start:
            return False
        path = self.ckpt.resolve_resume(explicit_path)
        if path is None:
            return False
        template = self._state_tree()
        restored, meta = load_checkpoint(path, template)
        self.state = self.state.replace(
            params=replicate(restored["params"], self.mesh),
            batch_stats=replicate(restored["batch_stats"], self.mesh),
            opt_state=replicate(restored["opt_state"], self.mesh),
            step=jnp.asarray(restored["step"]),
        )
        self.start_epoch = meta["epoch"] + 1
        return True

    def train_epoch(self, loader, epoch: int):
        import numpy as np

        from sls_tpu.augment.rawboost import rawboost_batch
        from sls_tpu.metrics.eer import roc_eer
        from sls_tpu.parallel.mesh import pad_batch_to_devices, shard_batch

        aug_cfg = self.cfg.train.rawboost
        n_seen, loss_sum, correct = 0, 0.0, 0.0
        scores_all, labels_all = [], []
        for b_idx, batch in enumerate(loader.epoch(epoch)):
            wav_np, labels_np, valid = pad_batch_to_devices(
                self.mesh, batch.wav, batch.labels, batch.valid
            )
            wav = jnp.asarray(wav_np)
            if aug_cfg.algo in range(1, 9):
                key = jax.random.fold_in(
                    jax.random.fold_in(self.rng, epoch), b_idx
                )
                wav = rawboost_batch(key, wav, aug_cfg)
            wav, labels, valid_dev = shard_batch(
                (wav, jnp.asarray(labels_np), jnp.asarray(valid)), self.mesh
            )
            self.state, metrics = self.train_step(
                self.state, wav, labels, valid_dev, self.rng
            )
            bsz = int(valid.sum())
            n_seen += bsz
            loss_sum += float(metrics["loss"]) * bsz
            correct += float(metrics["correct"])
            scores_all.append(np.asarray(metrics["scores"])[valid])
            labels_all.append(labels_np[valid])
        eer = roc_eer(np.concatenate(scores_all), np.concatenate(labels_all))
        n = max(n_seen, 1)
        return {"loss": loss_sum / n, "acc": 100 * correct / n, "eer": eer}

    def validate(self, loader):
        import numpy as np

        from sls_tpu.metrics.eer import roc_eer
        from sls_tpu.parallel.mesh import pad_batch_to_devices, shard_batch
        from sls_tpu.train.loss import weighted_nll

        n_seen, loss_sum, correct = 0, 0.0, 0.0
        scores_all, labels_all = [], []
        for batch in loader.epoch(0):
            wav_np, labels_np, valid = pad_batch_to_devices(
                self.mesh, batch.wav, batch.labels, batch.valid
            )
            wav = shard_batch(jnp.asarray(wav_np), self.mesh)
            out = self.eval_step(self.state.params, self.state.batch_stats, wav)
            logp = np.asarray(out["log_probs"])
            bsz = int(valid.sum())
            n_seen += bsz
            loss_sum += float(weighted_nll(
                jnp.asarray(logp[valid]), jnp.asarray(labels_np[valid]),
                self.cfg.train.loss_weights,
            )) * bsz
            correct += float(
                (np.argmax(logp[valid], -1) == labels_np[valid]).sum()
            )
            scores_all.append(np.asarray(out["score"])[valid])
            labels_all.append(labels_np[valid])
        eer = roc_eer(np.concatenate(scores_all), np.concatenate(labels_all))
        n = max(n_seen, 1)
        return {"loss": loss_sum / n, "acc": 100 * correct / n, "eer": eer}

    def fit(self, train_loader, val_loader, num_epochs=None):
        import time

        num_epochs = num_epochs or self.cfg.train.num_epochs
        for epoch in range(self.start_epoch, num_epochs):
            t0 = time.time()
            tr = self.train_epoch(train_loader, epoch)
            va = self.validate(val_loader)
            dt = time.time() - t0
            self.csv.log({
                "epoch": epoch,
                "train_loss": f"{tr['loss']:.6f}",
                "train_acc": f"{tr['acc']:.3f}",
                "train_eer": f"{tr['eer']:.4f}",
                "val_loss": f"{va['loss']:.6f}",
                "val_acc": f"{va['acc']:.3f}",
                "val_eer": f"{va['eer']:.4f}",
                "epoch_seconds": f"{dt:.1f}",
            })
            improved = self.ckpt.save_epoch(
                self._state_tree(), epoch,
                {"val_eer": va["eer"], "val_loss": va["loss"]},
            )
            print(
                f"[sls] epoch {epoch}: val_eer={va['eer']:.2f}%"
                f" ({dt:.1f}s){' *best*' if improved else ''}", flush=True,
            )

    def produce_scores(self, loader, out_path) -> int:
        import numpy as np

        from sls_tpu.parallel.mesh import pad_batch_to_devices, shard_batch
        from sls_tpu.scores.writer import ScoreWriter

        n = 0
        with ScoreWriter(out_path) as writer:
            for batch in loader.epoch(0):
                wav_np, _, valid = pad_batch_to_devices(
                    self.mesh, batch.wav, None, batch.valid
                )
                wav = shard_batch(jnp.asarray(wav_np), self.mesh)
                out = self.eval_step(
                    self.state.params, self.state.batch_stats, wav
                )
                score = np.asarray(out["score"])
                ids = list(batch.utt_ids) + [""] * (len(valid) - len(batch.utt_ids))
                writer.write_batch(
                    [u for u, ok in zip(ids, valid) if ok], score[valid]
                )
                n += int(valid.sum())
        return n
