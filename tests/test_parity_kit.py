"""Turn-key parity kit, simulated end-to-end at tiny topology.

The real run (reference weights + ASVspoof audio) is environment-blocked
on this image, so this test synthesizes the whole scenario: a
reference-NAMED torch dict checkpoint, a directory of real FLAC files,
and a reference score file produced by the independent torch-functional
detector — then drives `python -m sls_tpu.cli.parity_kit` exactly as it
would be driven the day real artifacts appear
(reference score loop: main.py:158-199; checkpoint format:
main.py:753-764)."""

import dataclasses
import json

import numpy as np
import pytest
import torch

from sls_tpu.cli.parity_kit import (
    diff_scores,
    infer_architecture,
    load_reference_checkpoint,
    main as kit_main,
)
from sls_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    SAEConfig,
    config_to_json,
    tiny_xlsr_config,
)
from sls_tpu.encoder.torch_ref import (
    make_detector_state,
    torch_detector_forward,
)
from tests.flac_encoder import encode_flac

WAV_LEN = 1000
DICT, K = 64, 8


@pytest.fixture(scope="module")
def kit_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_kit")
    enc_cfg = tiny_xlsr_config()
    state = make_detector_state(
        enc_cfg, dict_size=DICT, k=K, seed=5, weight_scale=0.125
    )

    ckpt = root / "best_checkpoint_eer.pth"
    torch.save(
        {
            "model": {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
            "epoch": 7,
            "args": {"use_window_topk": False, "sae_window_size": 8},
        },
        ckpt,
    )

    # synthetic corpus: varied lengths exercise pad_or_tile on decode
    wav_dir = root / "flac"
    wav_dir.mkdir()
    rng = np.random.default_rng(23)
    waves = {}
    for i in range(10):
        n = int(rng.integers(600, 1600))
        pcm = (rng.normal(0, 0.08, n) * 32767).clip(-32768, 32767).astype(
            np.int64
        )
        (wav_dir / f"UTT_{i:03d}.flac").write_bytes(
            encode_flac([pcm], mode="fixed")
        )
        waves[f"UTT_{i:03d}"] = (pcm / 32768.0).astype(np.float32)

    # reference scores: SAME decode semantics (pad_or_tile) + independent
    # torch-functional forward
    from sls_tpu.data.audio import pad_or_tile

    utts = sorted(waves)
    batch = np.stack([pad_or_tile(waves[u], WAV_LEN) for u in utts])
    logp = torch_detector_forward(state, enc_cfg, batch)
    ref_path = root / "scores_ref.txt"
    ref_path.write_text(
        "".join(f"{u} {s:.6f}\n" for u, s in zip(utts, np.exp(logp[:, 1])))
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            encoder=enc_cfg,
            sae=SAEConfig(activation_dim=enc_cfg.embed_dim, dict_size=DICT,
                          k=K),
        )
    )
    cfg_path = root / "config.json"
    cfg_path.write_text(config_to_json(cfg))
    return root, ckpt, wav_dir, ref_path, cfg_path, state


def test_checkpoint_loading_and_inference(kit_setup):
    _, ckpt, _, _, _, state0 = kit_setup
    state, meta = load_reference_checkpoint(str(ckpt))
    assert meta["epoch"] == 7
    assert set(state) == set(state0)

    kind, mcfg = infer_architecture(state, meta)
    assert kind == "sae"
    assert mcfg.sae.dict_size == DICT and mcfg.sae.k == K
    assert mcfg.sae.variant == "per_timestep"
    assert mcfg.use_sparse_features
    assert mcfg.encoder.encoder_layers == 2
    assert mcfg.encoder.embed_dim == 64
    assert mcfg.encoder.ffn_dim == 128

    # stored args flip the variant (shapes alone cannot)
    meta_w = dict(meta, args={"use_window_topk": True, "sae_window_size": 4})
    _, mcfg_w = infer_architecture(state, meta_w)
    assert mcfg_w.sae.variant == "window_overlap"
    assert mcfg_w.sae.window_size == 4
    _, mcfg_c = infer_architecture(state, dict(meta, args={"use_cpc": True}))
    assert mcfg_c.sae.variant == "window_hard"


def test_kit_end_to_end_parity(kit_setup, tmp_path):
    """The one command: convert + score a FLAC dir + diff = PARITY OK."""
    root, ckpt, wav_dir, ref_path, cfg_path, _ = kit_setup
    out = tmp_path / "scores_tpu.txt"
    rc = kit_main([
        "--cp_path", str(ckpt),
        "--wav_dir", str(wav_dir),
        "--ref_scores", str(ref_path),
        "--out", str(out),
        "--config_json", str(cfg_path),
        "--cut_length", str(WAV_LEN),
        "--batch_size", "4",  # 10 utts -> ragged tail exercises padding
        "--fp32",
        "--tolerance", "2e-3",
    ])
    assert rc == 0
    report = diff_scores(out, ref_path, 2e-3)
    assert report["n_compared"] == 10
    assert report["max_abs_diff"] < 2e-3
    assert report["decision_flips"] == 0


def test_kit_detects_divergence(kit_setup, tmp_path):
    """A corrupted reference file must FAIL parity (the kit can say no)."""
    root, ckpt, wav_dir, ref_path, cfg_path, _ = kit_setup
    bad_ref = tmp_path / "scores_bad.txt"
    lines = ref_path.read_text().splitlines()
    u0, s0 = lines[0].split()
    lines[0] = f"{u0} {1.0 - float(s0):.6f}"  # flip one decision
    bad_ref.write_text("\n".join(lines) + "\n")
    rc = kit_main([
        "--cp_path", str(ckpt),
        "--wav_dir", str(wav_dir),
        "--ref_scores", str(bad_ref),
        "--out", str(tmp_path / "s.txt"),
        "--config_json", str(cfg_path),
        "--cut_length", str(WAV_LEN),
        "--batch_size", "5",
        "--fp32",
    ])
    assert rc == 1


def test_diff_scores_misaligned_ids(tmp_path):
    """Partial id overlap: alignment must be keyed by id (hash map, not a
    quadratic index() scan — the DF eval list is ~600k utts) and both
    missing directions must be reported."""
    ours = tmp_path / "ours.txt"
    ref = tmp_path / "ref.txt"
    # ours: u0..u4; ref: u1..u5 shuffled -> common u1..u4, one missing
    # on each side; values differ per id so misalignment would be loud
    ours.write_text("".join(f"u{i} {0.1 * i:.6f}\n" for i in range(5)))
    ref.write_text(
        "".join(f"u{i} {0.1 * i:.6f}\n" for i in (3, 5, 1, 4, 2))
    )
    report = diff_scores(ours, ref, tolerance=1e-6)
    assert report["n_compared"] == 4
    assert report["n_missing_in_ref"] == 1   # u0
    assert report["n_missing_in_ours"] == 1  # u5
    assert report["max_abs_diff"] < 1e-12    # id-keyed alignment exact
    assert report["ok"]
