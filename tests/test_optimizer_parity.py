"""Golden parity: the optax chain in train/steps.py vs torch.optim.Adam.

The reference trains with ``torch.optim.Adam(lr, weight_decay=1e-4)``
(reference: main.py:526) whose weight decay is L2-ON-GRAD before the
moment updates — NOT AdamW.  steps.make_optimizer claims elementwise
equivalence; this test drives both optimizers through identical
multi-step trajectories (deterministic synthetic gradients) and compares
parameters elementwise at every step.
"""

import numpy as np
import pytest

from sls_tpu.train.steps import make_optimizer

torch = pytest.importorskip("torch")


def _grad_fn(param: np.ndarray, step: int) -> np.ndarray:
    # deterministic, parameter-dependent pseudo-gradients so any drift
    # between the two optimizers compounds over steps
    return np.sin(param * (1.0 + 0.1 * step)) + 0.01 * param**2


@pytest.mark.parametrize("weight_decay", [0.0, 1e-4, 1e-2])
def test_adam_matches_torch_elementwise(weight_decay):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    p0 = {
        "w": rng.normal(0, 1, (7, 5)).astype(np.float32),
        "b": rng.normal(0, 1, (5,)).astype(np.float32),
    }
    lr = 1e-3

    # torch side
    t_params = {
        k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in p0.items()
    }
    t_opt = torch.optim.Adam(
        t_params.values(), lr=lr, weight_decay=weight_decay,
        betas=(0.9, 0.999), eps=1e-8,
    )

    # optax side (the exact chain the Trainer uses)
    tx = make_optimizer(lr, weight_decay)
    j_params = {k: jnp.asarray(v) for k, v in p0.items()}
    opt_state = tx.init(j_params)

    for step in range(5):
        grads_np = {
            k: _grad_fn(np.asarray(j_params[k]), step) for k in p0
        }

        t_opt.zero_grad()
        for k in p0:
            # both sides must see the SAME gradient; use the jax params'
            # values so the trajectories can only diverge through the
            # optimizer math itself
            t_params[k].data = torch.from_numpy(np.asarray(j_params[k]).copy())
            t_params[k].grad = torch.from_numpy(grads_np[k].copy())
        t_opt.step()

        updates, opt_state = tx.update(
            {k: jnp.asarray(v) for k, v in grads_np.items()},
            opt_state,
            j_params,
        )
        j_params = {k: j_params[k] + updates[k] for k in p0}

        for k in p0:
            np.testing.assert_allclose(
                np.asarray(j_params[k]),
                t_params[k].detach().numpy(),
                rtol=1e-5, atol=1e-6,
                err_msg=f"step {step} param {k} wd {weight_decay}",
            )


def test_adamw_would_differ():
    """Sanity: AdamW (decoupled decay) diverges from the reference's
    Adam at nonzero weight decay — guards against someone 'simplifying'
    make_optimizer to optax.adamw."""
    import jax.numpy as jnp
    import optax

    p = {"w": jnp.ones((4, 4))}
    g = {"w": jnp.full((4, 4), 0.5)}
    ours = make_optimizer(1e-3, 1e-2)
    theirs = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)
    u1, _ = ours.update(g, ours.init(p), p)
    u2, _ = theirs.update(g, theirs.init(p), p)
    assert not np.allclose(np.asarray(u1["w"]), np.asarray(u2["w"]))
