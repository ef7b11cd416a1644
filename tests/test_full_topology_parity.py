"""Encoder parity at the REAL XLS-R-300M topology (24 layers, 1024 dim,
16 heads, FFN 4096, layer_norm extractor — reference checkpoint shape,
wav2vec/wav2vec2.py:540-647).

The tiny-topology golden tests can't catch converter indexing mistakes
that only exist at depth (e.g. a transposed layer range) or numerics
that only matter at width; this runs the full shape on random-init
weights — no checkpoint needed — and checks fp32 parity elementwise plus
characterizes the bf16(+fp32 islands) configuration.

Slow tier: ~2.5 GB of weights through two frameworks on the 1-core CPU
image. Run with `-m slow` (smoke tier skips it); the committed artifact
docs/PARITY_FULL_TOPOLOGY.json records a full run's numbers.
"""

import numpy as np
import pytest

from sls_tpu.config import XLSRConfig

pytestmark = pytest.mark.slow

WAV_LEN = 16000  # ~49 frames: enough to exercise every stage, CPU-feasible


def full_config(**overrides):
    # the dataclass defaults ARE the XLS-R-300M topology; just pin fp32
    import jax.numpy as jnp

    return XLSRConfig(dtype=overrides.pop("dtype", jnp.float32), **overrides)


@pytest.fixture(scope="module")
def full_state_and_wav():
    from sls_tpu.encoder.torch_ref import make_fairseq_state

    cfg = full_config()
    state = make_fairseq_state(cfg, seed=0)
    rng = np.random.default_rng(11)
    wav = rng.normal(0, 0.2, size=(1, WAV_LEN)).astype(np.float32)
    return cfg, state, wav


def test_full_topology_fp32_parity(full_state_and_wav):
    import jax.numpy as jnp

    from sls_tpu.encoder.convert import fairseq_encoder_to_flax
    from sls_tpu.encoder.torch_ref import torch_reference_forward
    from sls_tpu.encoder.xlsr import XLSREncoder

    cfg, state, wav = full_state_and_wav
    golden, stages = torch_reference_forward(state, cfg, wav, return_stages=True)

    params = fairseq_encoder_to_flax(state, cfg)
    enc = XLSREncoder(cfg)
    final, hiddens = enc.apply(
        {"params": params}, jnp.asarray(wav), train=False,
        return_hidden_states=True,
    )
    assert len(hiddens) == 24
    # Tolerances are RELATIVE to each stage's activation scale: random
    # 0.2-scale weights at 1024 width blow activations up to O(100), so
    # absolute thresholds would only measure fp32 accumulation-order
    # noise.  A converter indexing error shows up as rel ~O(1); measured
    # honest values are 5e-5 (layer 0) compounding to 1.3e-3 (layer 23)
    # — see docs/PARITY_FULL_TOPOLOGY.json.
    for i in (0, 11, 23):
        h = np.asarray(hiddens[i])
        g = stages[f"layer_{i}"]
        rel = float(np.abs(h - g).max() / np.abs(g).mean())
        assert rel < 5e-3, f"layer_{i} relative max-abs {rel}"
    rel_final = float(
        np.abs(np.asarray(final) - golden).max() / np.abs(golden).mean()
    )
    assert rel_final < 5e-3, f"final relative max-abs {rel_final}"


def test_full_topology_bf16_characterization(full_state_and_wav):
    """bf16 + fp32-island config stays within the documented envelope
    (relative error of the final features, not a bit-exact check)."""
    import jax.numpy as jnp

    from sls_tpu.encoder.convert import fairseq_encoder_to_flax
    from sls_tpu.encoder.torch_ref import torch_reference_forward
    from sls_tpu.encoder.xlsr import XLSREncoder

    from sls_tpu.encoder.torch_ref import make_fairseq_state

    cfg, _, wav = full_state_and_wav
    # trained-network-like weight scale: the 0.2 default explodes
    # activations to O(100) at 1024 width, which is unrepresentative of
    # a trained XLS-R and makes bf16 compounding look catastrophic
    # (measured rel 1.5 there vs ~1e-2 here)
    state = make_fairseq_state(
        cfg, seed=0, weight_scale=1.0 / np.sqrt(cfg.embed_dim)
    )
    golden = torch_reference_forward(state, cfg, wav)

    bf16_cfg = full_config(dtype=jnp.bfloat16)
    params = fairseq_encoder_to_flax(state, bf16_cfg)
    enc = XLSREncoder(bf16_cfg)
    final = np.asarray(
        enc.apply({"params": params}, jnp.asarray(wav), train=False)
    ).astype(np.float32)

    scale = float(np.abs(golden).mean())
    rel_max = float(np.abs(final - golden).max()) / scale
    rel_mean = float(np.abs(final - golden).mean()) / scale
    # measured (docs/PARITY_FULL_TOPOLOGY.json): mean ~1.5%, max ~10%
    # of the feature scale; max is a tail metric over ~50k elements so
    # the gate leaves headroom
    assert rel_mean < 0.03, f"bf16 relative mean-abs {rel_mean:.4f}"
    assert rel_max < 0.2, f"bf16 relative max-abs {rel_max:.4f}"
