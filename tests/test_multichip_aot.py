"""AOT compile proof: the FLAGSHIP topology sharded over 8 devices.

`__graft_entry__.dryrun_multichip` executes tiny shapes (the real
flagship materialized on a virtual CPU mesh costs ~30 GB and 30+ min of
init), which leaves real-width sharding problems — tp2 tile
divisibility at dict 4096, GSPMD decisions that differ at 1024/4096
widths — uncompiled anywhere.  This closes that gap without executing
anything: `jit(step).lower(abstract args).compile()` at the REAL
XLS-R-300M shapes (24L / 1024 / FFN 4096 / dict 4096 / k 128 / wav
64,600) for each production mesh layout, then asserts the expected
cross-device collectives actually appear in the optimized HLO.

Layouts proved here (mirroring dryrun_multichip's phases):
  dp8       — grad sync ⇒ all-reduce over the data axis
  dp4 × tp2 — Megatron FFN/SAE sharding ⇒ activation collectives
  dp2 × sp4 — frame-axis sharding ⇒ per-layer K/V all-gather

Capability bar: SURVEY §5.8 (the reference has nothing distributed —
nn.DataParallel only, main.py:518).  Slow tier: three full-topology
XLA CPU compiles on the 1-core image.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sls_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    SAEConfig,
    TrainConfig,
    XLSRConfig,
)
from sls_tpu.models.detector import Detector
from sls_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from sls_tpu.train.steps import create_train_state, make_train_step

pytestmark = pytest.mark.slow

WAV_LEN = 64600
BATCH = 16

COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)


def _flagship_cfg(**encoder_overrides) -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(
            encoder=XLSRConfig(dtype=jnp.bfloat16, **encoder_overrides),
            use_sae=True,
            use_sparse_features=True,
            sae=SAEConfig(activation_dim=1024, dict_size=4096, k=128),
        ),
        train=TrainConfig(batch_size=BATCH),
    )


def _abstract_state(model, cfg):
    """TrainState of ShapeDtypeStructs — no parameter materialization."""
    return jax.eval_shape(
        lambda k, w: create_train_state(model, cfg, k, w),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, WAV_LEN), jnp.float32),
    )


def _abstract_batch(mesh):
    data = batch_sharding(mesh)
    return (
        jax.ShapeDtypeStruct((BATCH, WAV_LEN), jnp.float32, sharding=data),
        jax.ShapeDtypeStruct((BATCH,), jnp.int32, sharding=data),
        jax.ShapeDtypeStruct((BATCH,), jnp.bool_, sharding=data),
    )


def _with_shardings(abstract_tree, sharding_tree):
    return jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        abstract_tree,
        sharding_tree,
    )


def _compile_and_get_hlo(step, state_abs, mesh):
    wav, labels, valid = _abstract_batch(mesh)
    key = jax.random.PRNGKey(0)  # legacy raw key: shape (2,) uint32
    rng = jax.ShapeDtypeStruct(
        key.shape, key.dtype, sharding=replicated(mesh),
    )
    compiled = step.lower(state_abs, wav, labels, valid, rng).compile()
    return compiled.as_text()


def _found_collectives(hlo: str):
    return sorted(op for op in COLLECTIVE_OPS if op in hlo)


def test_dp8_flagship_compiles_with_grad_allreduce():
    cfg = _flagship_cfg()
    model = Detector(cfg.model)
    mesh = make_mesh(jax.devices()[:8])
    state_abs = _abstract_state(model, cfg)
    step = make_train_step(model, cfg, mesh)
    hlo = _compile_and_get_hlo(step, state_abs, mesh)
    found = _found_collectives(hlo)
    assert "all-reduce" in found, (
        f"dp8 grad sync must compile to an all-reduce; found only {found}"
    )


def test_dp4_tp2_flagship_compiles_with_activation_collectives():
    """tp2 at the real widths: dict 4096 and FFN 4096 tile over 2 shards
    (weight shapes must divide the model axis — the divisibility rule in
    parallel/tensor.spec_for_path is exercised at production sizes)."""
    from sls_tpu.parallel.tensor import state_shardings

    cfg = dataclasses.replace(
        _flagship_cfg(grouped_conv_einsum=True),
        train=TrainConfig(batch_size=BATCH, model_parallel=2),
    )
    model = Detector(cfg.model)
    mesh = make_mesh(
        jax.devices()[:8], shape=(4, 2), axis_names=("data", "model")
    )
    state_abs = _abstract_state(model, cfg)
    sh = state_shardings(state_abs, mesh)

    # the sharding rules must actually hit at these widths: at least the
    # SAE encoder/decoder and every FFN fc1/fc2 should be model-sharded
    specs = [
        s.spec for s in jax.tree.leaves(
            sh, is_leaf=lambda x: hasattr(x, "spec")
        )
    ]
    n_sharded = sum(1 for p in specs if any(ax is not None for ax in p))
    assert n_sharded >= 24 * 4, (
        f"only {n_sharded} state leaves model-sharded at dict 4096 / "
        f"ffn 4096 — the tp2 rules are not hitting at real widths"
    )

    state_abs_sh = _with_shardings(state_abs, sh)
    step = make_train_step(model, cfg, mesh, "inherit")
    hlo = _compile_and_get_hlo(step, state_abs_sh, mesh)
    found = _found_collectives(hlo)
    assert "all-reduce" in found
    assert any(
        op in found for op in
        ("all-gather", "reduce-scatter", "all-to-all", "collective-permute")
    ), f"tp2 should induce activation collectives; found only {found}"


def test_dp2_sp4_flagship_compiles_with_seq_collectives():
    """Sequence parallelism at the real topology: the frame axis of
    every transformer activation sharded 4-way; attention needs K/V from
    every shard, so GSPMD must insert gather-style collectives."""
    from sls_tpu.parallel.sequence import sp_mesh, sp_model_config

    cfg = _flagship_cfg()
    cfg = dataclasses.replace(cfg, model=sp_model_config(cfg.model))
    model = Detector(cfg.model)
    mesh = sp_mesh(4, jax.devices()[:8], n_data=2)
    with jax.sharding.set_mesh(mesh):
        state_abs = _abstract_state(model, cfg)
        step = make_train_step(model, cfg, mesh)
        hlo = _compile_and_get_hlo(step, state_abs, mesh)
    found = _found_collectives(hlo)
    assert "all-reduce" in found
    assert any(
        op in found for op in ("all-gather", "all-to-all", "collective-permute")
    ), f"sp4 attention needs K/V exchange; found only {found}"


def test_dp8_sls_compiles_with_grad_allreduce():
    """The SLS family's dp8 train step at the REAL topology: the family
    is data-parallel only (models/sls.py SLSTrainer), so this plus the
    EER-parity rehearsal is its full distributed proof.  batch_stats
    threading (BatchNorm) rides the same replicated sharding as params;
    grad sync must still compile to an all-reduce."""
    from sls_tpu.models.sls import (
        SLSDetector, create_sls_train_state, make_sls_train_step,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            encoder=XLSRConfig(dtype=jnp.bfloat16),
            use_sae=False,
        ),
        train=TrainConfig(batch_size=BATCH),
    )
    model = SLSDetector(cfg.model)
    mesh = make_mesh(jax.devices()[:8])
    state_abs = jax.eval_shape(
        lambda k, w: create_sls_train_state(model, cfg, k, w),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, WAV_LEN), jnp.float32),
    )
    step = make_sls_train_step(model, cfg, mesh)
    hlo = _compile_and_get_hlo(step, state_abs, mesh)
    found = _found_collectives(hlo)
    assert "all-reduce" in found, (
        f"SLS dp8 grad sync must compile to an all-reduce; found {found}"
    )


def test_real_width_proxy_executes():
    """Phase 5 of the driver dryrun (VERDICT r4 #5), suite-pinned: one
    EXECUTED train step at real widths — 4 x 1024/4096 layers, real
    conv stack, SAE dict 4096 k 128, wav 64600 — on the dp4xtp2 mesh.
    The AOT tests above prove the real-DEPTH program compiles; this
    proves real-WIDTH sharded execution (layouts, collective runtime,
    memory) on the 8-device mesh.  ~3 min on the 1-core image (slow
    tier); the driver runs the same phase every round via
    __graft_entry__.dryrun_multichip."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    # subprocess: dryrun self-provisions its backend, and the suite's
    # conftest has already initialized this process's backend
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "real-width dp4xtp2" in proc.stdout, proc.stdout
