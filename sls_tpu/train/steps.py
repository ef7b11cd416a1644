"""Jitted SPMD train/eval steps.

The hot loop of the reference trainer (reference: main.py:201-258
train_epoch, main.py:98-156 evaluate_accuracy) as pure jitted functions
over a data mesh: params replicated, batch sharded on 'data', gradient
all-reduce inserted by XLA over ICI (SURVEY.md §5.8).

Optimizer matches torch ``Adam(lr, weight_decay=wd)`` exactly: L2 decay is
added to the gradient *before* the Adam moment updates
(optax.add_decayed_weights ahead of scale_by_adam), which differs from
AdamW (reference: main.py:526).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sls_tpu.config import ExperimentConfig
from sls_tpu.models.detector import Detector, total_loss
from sls_tpu.train.loss import weighted_nll


class TrainState(train_state.TrainState):
    """Standard flax TrainState; dropout rngs are derived per-step from
    (base_rng, step) so resume is deterministic."""


def dequantize_wire(wav: jnp.ndarray) -> jnp.ndarray:
    """Wire format -> float32 audio (data/pipeline.to_wire).

    The dtype check happens at trace time, so the float path compiles to
    nothing, and the quantized paths' elementwise decodes fuse into the
    first feature-extractor conv's input read.

    int16: lossless for 16-bit sources — to_wire emits round(f * 32768)
    and this inverts it exactly.
    uint8: mu-law companding (data/mulaw.py, mu=255) — LOSSY opt-in wire
    for bandwidth-bound serving; must match mulaw.mulaw_decode exactly
    (tests/test_mulaw.py asserts the two decoders agree)."""
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) * (1.0 / 32768.0)
    if wav.dtype == jnp.uint8:
        y = wav.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        ln256 = 5.545177444479562  # log(256), mu=255 companding
        return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * ln256) * (1.0 / 255.0))
    return wav


def make_optimizer(
    lr: float,
    weight_decay: float,
    decay_mask=None,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalent (L2-on-grad, not AdamW).

    ``decay_mask``: optional bool pytree (or params->pytree callable)
    selecting which params receive weight decay.  Frozen params MUST be
    excluded: their gradients are exactly zero (stop_gradient), so Adam
    leaves them untouched — but unmasked decay would inject wd*p as the
    gradient, which Adam normalizes to a ~sign(p)*lr drift per step,
    progressively corrupting a "frozen" encoder (torch Adam skips
    requires_grad=False params entirely).

    ``trainable_mask``: optional bool pytree (or callable) selecting
    the params the optimizer maintains AT ALL.  With freeze_encoder the
    encoder's grads are exactly zero, yet an unmasked Adam still decays
    both moment buffers every step — for XLS-R-300M that is ~2.4 GB of
    dead fp32 moments in HBM plus their read+write each step.  Masking
    the whole chain allocates no state for frozen leaves and passes
    their (zero) gradients through untouched, matching torch Adam over
    requires_grad=True params only (reference main.py builds Adam over
    model.parameters() of a model whose SSL front may be frozen).
    """
    transforms = []
    if weight_decay:
        wd = optax.add_decayed_weights(weight_decay)
        if decay_mask is not None:
            wd = optax.masked(wd, decay_mask)
        transforms.append(wd)
    transforms.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    transforms.append(optax.scale(-lr))
    tx = optax.chain(*transforms)
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx


def trainable_decay_mask(cfg: ExperimentConfig):
    """Decay mask honoring ``freeze_encoder``: None when nothing is
    frozen (decay everything), else a callable masking the encoder.
    The same mask serves as ``trainable_mask`` (the frozen set is the
    same either way)."""
    if not cfg.model.freeze_encoder:
        return None

    def mask(params):
        return {
            k: jax.tree.map(lambda _: k != "encoder", v)
            for k, v in params.items()
        }

    return mask


def create_train_state(
    model: Detector,
    cfg: ExperimentConfig,
    rng: jax.Array,
    sample_wav: jnp.ndarray,
) -> TrainState:
    # jitted init: one compiled program instead of thousands of small
    # dispatches (matters on relayed backends)
    init_fn = jax.jit(
        lambda key: model.init(
            {"params": key, "dropout": jax.random.fold_in(key, 1)},
            sample_wav,
            train=False,
            # CPC head params only materialize when the CPC branch runs
            compute_cpc=cfg.model.use_cpc,
        )
    )
    variables = init_fn(rng)
    mask = trainable_decay_mask(cfg)
    tx = make_optimizer(
        cfg.train.lr, cfg.train.weight_decay, mask, trainable_mask=mask
    )
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def make_train_step(
    model: Detector,
    cfg: ExperimentConfig,
    mesh: Optional[Mesh] = None,
    state_shardings=None,
) -> Callable:
    """Build the jitted train step.

    Returns step(state, wav [B,S], labels [B], base_rng) ->
    (state, metrics dict with loss/cls_loss/sae_loss/cpc_loss/scores).

    ``state_shardings``: optional NamedSharding pytree matching the
    TrainState (parallel/tensor.state_shardings) for tensor-parallel
    layouts on a 2-D mesh; default replicates the whole state.
    """
    tcfg = cfg.train
    compute_cpc = cfg.model.use_cpc

    def step(state: TrainState, wav, labels, valid, base_rng):
        wav = dequantize_wire(wav)
        dropout_rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                wav,
                train=True,
                compute_cpc=compute_cpc,
                rngs={"dropout": dropout_rng},
            )
            cls = weighted_nll(
                out["log_probs"], labels, tcfg.loss_weights, valid
            )
            loss = total_loss(
                cls, out["sae_loss"], tcfg.sae_weight,
                out["cpc_loss"], tcfg.cpc_weight if compute_cpc else 0.0,
            )
            aux = {
                "cls_loss": cls,
                "sae_loss": out["sae_loss"],
                "cpc_loss": out["cpc_loss"],
                "scores": out["score"],
                "log_probs": out["log_probs"],
            }
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        # Non-finite guard INSIDE the step: a NaN/Inf loss must not poison
        # params or Adam moments, so the update is committed only when the
        # loss is finite (the reference filters non-finite scores,
        # main.py:140-143; here the whole state transition is rejected).
        finite = jnp.isfinite(loss)
        new_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_state, state
        )
        correct = ((jnp.argmax(aux["log_probs"], -1) == labels) * valid).sum()
        metrics = {
            "loss": loss,
            "cls_loss": aux["cls_loss"],
            "sae_loss": aux["sae_loss"],
            "cpc_loss": aux["cpc_loss"],
            "scores": aux["scores"],
            "correct": correct,
            "finite": finite,
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if state_shardings == "inherit":
        # tensor-parallel layouts: the state arrives committed with its
        # per-leaf shardings (parallel/tensor.place_state); jit inherits
        # them and the elementwise optimizer update preserves them
        state_sh, state_out = None, None
    else:
        state_sh = repl if state_shardings is None else state_shardings
        state_out = (state_sh, None)
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(state_sh, data, data, data, repl),
        out_shardings=state_out,
    )


def make_eval_step(
    model: Detector,
    cfg: ExperimentConfig,
    mesh: Optional[Mesh] = None,
    params_shardings=None,
) -> Callable:
    """Build the jitted eval step: (params, wav) -> dict with score [B],
    log_probs, sae_loss (for validation telemetry)."""

    def step(params, wav):
        wav = dequantize_wire(wav)
        out = model.apply({"params": params}, wav, train=False)
        res = {
            "score": out["score"],
            "log_probs": out["log_probs"],
            "sae_loss": out["sae_loss"],
        }
        if "recon" in out:
            # per-example MSE so validation can mask padded tail-fill
            # rows exactly (masked mean of these == exact masked scalar)
            diff = out["recon"].astype(jnp.float32) - out["features"]
            res["sae_loss_per_example"] = jnp.mean(
                jnp.square(diff), axis=(1, 2)
            )
        return res

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if params_shardings == "inherit":
        params_sh = None
    else:
        params_sh = repl if params_shardings is None else params_shardings
    return jax.jit(step, in_shardings=(params_sh, data), out_shardings=None)
