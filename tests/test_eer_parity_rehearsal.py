"""End-to-end EER-parity rehearsal at the REAL topology, every variant.

The north-star contract — "the reference stack and the sls_tpu stack
produce the same EER / min t-DCF from the same corpus and weights" —
was previously only covered piecewise (elementwise activation goldens,
score-file diffs, scorer goldens).  This test asserts the composition:

    synthetic FLAC corpus + reference-named .pth checkpoint
      ├── reference pipeline: decode → pad_or_tile → torch-functional
      │   forward (encoder/torch_ref.py) → score file
      └── sls_tpu pipeline: `python -m sls_tpu.cli.parity_kit`
          (convert ckpt → BatchLoader/native decode → jitted forward
          → score file)
    → BOTH score files through the official 2021-LA scorer
      (scores/evaluate.py: EER + min t-DCF with ASV operating point)
    → EER and min t-DCF must be EQUAL.

Covered model variants at the real XLS-R-300M topology (24L / 1024 /
FFN 4096 / dict 4096 / k 128): per-timestep TopK, window-overlap TopK,
window-hard TopK (the CPC model's scoring path — the CPC branch only
affects training loss, reference model_cpc.py:319-410), and the
upstream XLS-R+SLS family.

Reference call chain being rehearsed: main.py:158-199
(produce_evaluation_file) → evaluate_2021_LA.py:72-99 (scoring).

Slow tier: ~1.2 GB of weights through two frameworks × 4 variants on
the 1-core CPU image.
"""

import os

import numpy as np
import pytest
import torch

from sls_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    XLSRConfig,
    config_to_json,
)
from sls_tpu.encoder.torch_ref import (
    make_detector_state,
    make_sls_head_state,
    torch_detector_forward,
    torch_sls_forward,
)
from sls_tpu.scores.evaluate import score_2021_la
from sls_tpu.scores.writer import ScoreWriter, read_score_file
from tests.flac_encoder import encode_flac

pytestmark = pytest.mark.slow

N_UTTS = 12
DICT, K, W = 4096, 128, 8


def _full_config():
    import jax.numpy as jnp

    return XLSRConfig(dtype=jnp.float32)


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    root = tmp_path_factory.mktemp("eer_rehearsal")
    enc_cfg = _full_config()

    # wav length with T ≡ 0 (mod w/2·2): every frame covered by a
    # 50%-overlap window, where elementwise reference parity is defined
    # (see test_full_topology_parity.py for the uncovered-tail note)
    wav_len = 16000
    while enc_cfg.num_frames(wav_len) % 4 != 0:
        wav_len += 80

    # --- corpus: N real FLAC files + the float waves they decode to ---
    utts = [f"LA_E_{i:07d}" for i in range(N_UTTS)]
    labels = ["bonafide" if i % 2 == 0 else "spoof" for i in range(N_UTTS)]
    wav_dir = root / "flac"
    wav_dir.mkdir()
    rng = np.random.default_rng(29)
    waves = {}
    for u in utts:
        n = int(rng.integers(wav_len - 4000, wav_len + 4000))
        pcm = (rng.normal(0, 0.08, n) * 32767).clip(-32768, 32767).astype(
            np.int64
        )
        (wav_dir / f"{u}.flac").write_bytes(encode_flac([pcm], mode="fixed"))
        waves[u] = (pcm / 32768.0).astype(np.float32)

    from sls_tpu.data.audio import pad_or_tile

    batch = np.stack([pad_or_tile(waves[u], wav_len) for u in utts])

    # --- organizer truth package (LA layout, phase 'eval') ---
    truth = root / "keys"
    asv_rows, asv_scores = [], []
    arng = np.random.default_rng(0)
    for i in range(30):
        asv_rows.append(f"spk a_t{i} c d e target f eval")
        asv_scores.append(f"x y {arng.normal(2.0, 1.0)}")
        asv_rows.append(f"spk a_n{i} c d e nontarget f eval")
        asv_scores.append(f"x y {arng.normal(-2.0, 1.0)}")
        asv_rows.append(f"spk a_s{i} c d e spoof f eval")
        asv_scores.append(f"x y {arng.normal(0.0, 1.0)}")
    _write_lines(str(truth / "LA/ASV/trial_metadata.txt"), asv_rows)
    _write_lines(str(truth / "LA/ASV/ASVTorch_Kaldi/score.txt"), asv_scores)
    _write_lines(
        str(truth / "LA/CM/trial_metadata.txt"),
        [f"spk {u} c d e {lab} f eval" for u, lab in zip(utts, labels)],
    )

    # --- ONE shared full-topology detector checkpoint (all SAE variants
    # share parameters; only the sparsify rule differs) ---
    state = make_detector_state(
        enc_cfg, dict_size=DICT, k=K, seed=3,
        weight_scale=1.0 / np.sqrt(enc_cfg.embed_dim),
    )
    # a real CPC checkpoint carries cpc_proj/cpc_pred params the scoring
    # path must tolerate (reference model_cpc.py:288-302)
    crng = np.random.default_rng(9)
    state_cpc_extras = {
        "cpc_proj.0.weight": crng.normal(size=(256, DICT)).astype(np.float32),
        "cpc_proj.0.bias": np.zeros(256, np.float32),
        "cpc_proj.2.weight": crng.normal(size=(256, 256)).astype(np.float32),
        "cpc_proj.2.bias": np.zeros(256, np.float32),
        "cpc_pred.0.weight": crng.normal(size=(256, 256)).astype(np.float32),
        "cpc_pred.0.bias": np.zeros(256, np.float32),
    }
    ckpt = root / "best_checkpoint_eer.pth"
    torch.save(
        {
            "model": {
                k_: torch.from_numpy(np.asarray(v))
                for k_, v in {**state, **state_cpc_extras}.items()
            },
            "epoch": 11,
            "args": {"use_window_topk": False, "sae_window_size": W},
        },
        ckpt,
    )

    return {
        "root": root, "enc_cfg": enc_cfg, "wav_len": wav_len,
        "utts": utts, "labels": labels, "wav_dir": wav_dir,
        "batch": batch, "truth": truth, "state": state, "ckpt": ckpt,
    }


def _assert_scorer_parity(ref_path, tpu_path, truth, utts):
    """Same EER and same min t-DCF from the official scorer, guarded by
    an ordering-safety margin (EER is a rank statistic: equality is only
    meaningful if numeric noise cannot reorder scores)."""
    ref_ids, ref_s = read_score_file(ref_path)
    tpu_ids, tpu_s = read_score_file(tpu_path)
    tpu_map = dict(zip(tpu_ids, tpu_s))
    assert set(tpu_ids) == set(utts)
    tpu_aligned = np.asarray([tpu_map[u] for u in ref_ids])

    max_diff = float(np.abs(tpu_aligned - ref_s).max())
    gaps = np.diff(np.sort(ref_s))
    min_gap = float(gaps.min())
    assert min_gap > 4 * max_diff, (
        f"score spread too tight for a rank-statistic assertion: "
        f"min pairwise gap {min_gap:.3e} vs max stack diff {max_diff:.3e}"
    )

    res_ref = score_2021_la(str(ref_path), str(truth), "eval")
    res_tpu = score_2021_la(str(tpu_path), str(truth), "eval")
    assert res_tpu.eer == res_ref.eer
    assert res_tpu.min_tdcf == pytest.approx(res_ref.min_tdcf, rel=1e-12)
    assert res_tpu.inverted_is_better == res_ref.inverted_is_better
    return res_ref


@pytest.mark.parametrize(
    "variant", ["per_timestep", "window_overlap", "window_hard"]
)
def test_sae_variant_eer_parity(rehearsal, tmp_path, variant):
    from sls_tpu.cli.parity_kit import main as kit_main

    r = rehearsal
    logp = torch_detector_forward(
        r["state"], r["enc_cfg"], r["batch"], variant=variant, window_size=W
    )
    ref_path = tmp_path / f"scores_ref_{variant}.txt"
    with ScoreWriter(ref_path) as w:
        w.write_batch(r["utts"], np.exp(logp[:, 1].astype(np.float64)))

    tpu_path = tmp_path / f"scores_tpu_{variant}.txt"
    rc = kit_main([
        "--cp_path", str(r["ckpt"]),
        "--wav_dir", str(r["wav_dir"]),
        "--out", str(tpu_path),
        "--variant", variant,
        "--window_size", str(W),
        "--cut_length", str(r["wav_len"]),
        "--batch_size", "5",  # ragged tail exercises the valid mask
        "--fp32",
    ])
    assert rc == 0

    res = _assert_scorer_parity(ref_path, tpu_path, r["truth"], r["utts"])
    # random weights: EER must be a real number the DET sweep produced,
    # not the degenerate-input fallback
    assert 0.0 <= res.eer <= 1.0 and np.isfinite(res.min_tdcf)


def test_sls_family_eer_parity(rehearsal, tmp_path):
    from sls_tpu.cli.parity_kit import main as kit_main

    r = rehearsal
    enc_cfg = r["enc_cfg"]
    t = enc_cfg.num_frames(r["wav_len"])
    flat_dim = (t // 3) * (enc_cfg.embed_dim // 3)
    head = dict(make_sls_head_state(
        seed=1, flat_dim=flat_dim, embed_dim=enc_cfg.embed_dim
    ))
    # make_sls_head_state's 0.1-scale fc3 is tuned for tiny widths; at
    # the real 1024-d head the random-weight logits land at ~±900 and
    # softmax saturates every utterance to P=1.0 exactly — no rank
    # statistic exists there.  Scale fc3 so logits sit in the responsive
    # range (measured ~±1.8 at 0.002).
    head["fc3.weight"] = head["fc3.weight"] * 0.002
    head["fc3.bias"] = head["fc3.bias"] * 0.002
    enc_state = {
        key[len("ssl_model.model."):]: v
        for key, v in r["state"].items()
        if key.startswith("ssl_model.model.")
    }
    full = {
        key: v for key, v in r["state"].items()
        if key.startswith("ssl_model.model.")
    }
    full.update(head)
    ckpt = tmp_path / "sls_checkpoint.pth"
    torch.save(
        {k_: torch.from_numpy(np.asarray(v)) for k_, v in full.items()}, ckpt
    )

    logp = torch_sls_forward(enc_state, head, enc_cfg, r["batch"])
    ref_path = tmp_path / "scores_ref_sls.txt"
    with ScoreWriter(ref_path) as w:
        w.write_batch(r["utts"], np.exp(logp[:, 1].astype(np.float64)))

    cfg_path = tmp_path / "sls_config.json"
    cfg_path.write_text(config_to_json(ExperimentConfig(
        model=ModelConfig(encoder=enc_cfg, use_sae=False)
    )))
    tpu_path = tmp_path / "scores_tpu_sls.txt"
    rc = kit_main([
        "--cp_path", str(ckpt),
        "--wav_dir", str(r["wav_dir"]),
        "--out", str(tpu_path),
        "--config_json", str(cfg_path),
        "--cut_length", str(r["wav_len"]),
        "--batch_size", "5",
        "--fp32",
    ])
    assert rc == 0
    _assert_scorer_parity(ref_path, tpu_path, r["truth"], r["utts"])
