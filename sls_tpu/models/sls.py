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
from sls_tpu.train.loop import BaseTrainer
from sls_tpu.train.loss import weighted_nll
from sls_tpu.train.steps import make_optimizer
from flax import linen as nn


class SLSDetector(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        encoder = XLSREncoder(self.config.encoder, name="encoder")
        final, hiddens = encoder(wav, train=train, return_hidden_states=True)
        if self.config.freeze_encoder:
            # honored like Detector (detector.py): the 'frozen XLS-R +
            # SLS head' baseline must not fine-tune the encoder
            final = jax.lax.stop_gradient(final)
            hiddens = [jax.lax.stop_gradient(h) for h in hiddens]
        # pass the raw per-layer list (the head pools each layer where
        # it is produced instead of re-reading a stack from HBM) and
        # run the head's wide MLP in the encoder's compute dtype —
        # together 62.8 -> ~43 ms/batch at b36 on v5e; the dominant
        # term was the fp32 fc1 GEMM with a runtime weight, see
        # heads/sls.py and BENCH_NOTES_r4 sls_head_root_cause
        log_probs = SLSHead(
            name="sls_head", dtype=self.config.encoder.dtype
        )(hiddens, train=train)
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
    from sls_tpu.train.steps import trainable_decay_mask

    mask = trainable_decay_mask(cfg)
    return SLSTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(
            cfg.train.lr, cfg.train.weight_decay, mask, trainable_mask=mask
        ),
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
        # Reject the whole transition (params, moments, batch_stats) on a
        # non-finite loss — see sls_tpu.train.steps.make_train_step.
        finite = jnp.isfinite(loss)
        new_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_state, state
        )
        metrics = {
            "loss": loss,
            "scores": out["score"],
            "correct": ((jnp.argmax(out["log_probs"], -1) == labels)
                        * valid).sum(),
            "finite": finite,
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
                     name="fc0")(pooled)
        )
        return gate[..., 0]  # [L, B]


import functools


@functools.lru_cache(maxsize=4)
def _gate_probe_fwd(config: ModelConfig):
    """Jitted gate probe cached per config — a fresh jit per call would
    re-compile the 300M encoder every time (minutes per call)."""
    probe = _GateProbe(config)

    @jax.jit
    def f(p, w):
        return probe.apply({"params": p}, w)

    return f


def layer_gate_profile(
    model: SLSDetector, params, batch_stats, wav, return_gates: bool = False
) -> Dict:
    """Which encoder layers does the SLS head consider sensitive?

    Returns per-layer mean/std of the sigmoid layer gates over a batch —
    the interpretability question the SLS architecture exists to answer
    (layer-gated fusion in heads/sls.py).  ``batch_stats`` is unused (the
    gates sit before the BatchNorm) but kept for API symmetry.
    ``return_gates`` additionally includes the raw [L, B] gate matrix so
    callers needing per-example breakdowns (cli.analyze gates' per-class
    means) don't pay the 300M encoder forward twice.
    """
    import numpy as np

    probe_params = {
        "encoder": params["encoder"],
        "fc0": params["sls_head"]["fc0"],
    }
    gates = np.asarray(_gate_probe_fwd(model.config)(probe_params, wav))
    out = {
        "mean_gate_per_layer": gates.mean(axis=1).tolist(),
        "std_gate_per_layer": gates.std(axis=1).tolist(),
        "most_sensitive_layers": np.argsort(-gates.mean(axis=1))[:5].tolist(),
    }
    if return_gates:
        out["gates"] = gates
    return out


class SLSTrainer(BaseTrainer):
    """Epoch driver for the SLS parity model: the shared BaseTrainer loop
    with batch_stats threading in the state tree and eval step."""

    log_prefix = "[sls] "

    def _build_model_and_steps(self) -> None:
        if self.cfg.train.model_parallel > 1:
            raise NotImplementedError(
                "model_parallel > 1 is wired for the SAE Detector family "
                "(parallel/tensor.py rules); the SLS parity model is "
                "data-parallel only"
            )
        self.model = SLSDetector(self.cfg.model)
        self.train_step = make_sls_train_step(self.model, self.cfg, self.mesh)
        self.eval_step = make_sls_eval_step(self.model, self.eval_mesh)

    def _create_state(self, sample_wav: jnp.ndarray) -> SLSTrainState:
        return create_sls_train_state(self.model, self.cfg, self.rng, sample_wav)

    def _state_tree(self):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }

    def _restore_state(self, restored) -> None:
        from sls_tpu.parallel.mesh import replicate

        self.state = self.state.replace(
            params=replicate(restored["params"], self.mesh),
            batch_stats=replicate(restored["batch_stats"], self.mesh),
            opt_state=replicate(restored["opt_state"], self.mesh),
            step=jnp.asarray(restored["step"]),
        )

    def _run_eval(self, wav):
        params, batch_stats = self._to_eval_mesh(
            (self.state.params, self.state.batch_stats)
        )
        return self.eval_step(params, batch_stats, wav)

    def _resume_from_torch(self, path) -> bool:
        """Weights-only restore from an upstream SLS PyTorch checkpoint
        (the model behind EER 1.92% DF / 2.87% LA, reference
        README.md:84-86; parameter names fc0/first_bn/fc1/fc3 +
        ssl_model.model.*)."""
        import numpy as np
        import torch

        from sls_tpu.encoder.convert import sls_detector_state_to_flax
        from sls_tpu.parallel.mesh import replicate

        assert self.state is not None, "call init_state() before resume()"
        raw = torch.load(path, map_location="cpu", weights_only=True)
        state = raw.get("model", raw) if isinstance(raw, dict) else raw
        state = {k: np.asarray(v) for k, v in state.items()}
        variables = sls_detector_state_to_flax(state, self.cfg.model)
        self.state = self.state.replace(
            params=replicate(variables["params"], self.mesh),
            batch_stats=replicate(variables["batch_stats"], self.mesh),
        )
        self._torch_epoch_from(raw, path)
        return True
