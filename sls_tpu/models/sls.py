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
import optax
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
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_wav, train=False,
    )
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

    def step(state: SLSTrainState, wav, labels, base_rng):
        dropout_rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                wav, train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss = weighted_nll(out["log_probs"], labels, tcfg.loss_weights)
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
            "correct": (jnp.argmax(out["log_probs"], -1) == labels).sum(),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(repl, data, data, repl),
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
