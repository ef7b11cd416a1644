"""Turn-key real-weights parity kit — THE command to run when trained
reference weights and real audio become available:

    python -m sls_tpu.cli.parity_kit \\
        --cp_path best_checkpoint_eer.pth \\
        --wav_dir /data/ASVspoof2021_DF_eval/flac \\
        --ref_scores scores_DF_reference.txt \\
        --out scores_DF_tpu.txt

One invocation: loads the PyTorch checkpoint, infers the architecture
from the weights (the reference's checkpoint-as-config idiom,
test_interpretability.py:33-47), converts to Flax, scores every
utterance on the TPU exactly like the reference score loop
(reference: main.py:158-199 produce_evaluation_file), and diffs the
resulting score file elementwise against the reference's.

Also usable without --ref_scores as a plain checkpoint-driven scorer,
and with --eval_list/--database_path for protocol-driven eval layouts.

Exit code 0 = scores produced (and, when diffed, max |Δscore| within
--tolerance); 1 = parity failure; 2 = usage error (argparse).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_reference_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load a reference .pth: dict checkpoints ({'model': state, 'args':
    ..., 'epoch': ...}, main.py:753-764) or bare state dicts, with
    DataParallel 'module.' prefixes stripped (main.py:542-560)."""
    import torch

    from sls_tpu.encoder.convert import strip_prefixes

    try:
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints may embed argparse.Namespace in 'args'
        raw = torch.load(path, map_location="cpu", weights_only=False)

    meta: Dict[str, Any] = {}
    if isinstance(raw, dict) and "model" in raw:
        state = raw["model"]
        meta["epoch"] = raw.get("epoch")
        args = raw.get("args")
        if args is not None:
            meta["args"] = vars(args) if hasattr(args, "__dict__") else dict(args)
    else:
        state = raw
    state = strip_prefixes({k: np.asarray(v) for k, v in state.items()})
    return state, meta


def infer_architecture(
    state: Dict[str, np.ndarray],
    meta: Dict,
    variant: str = "auto",
    window_size: int = 0,
):
    """Architecture from weights + stored args.

    Weight shapes give family (SLS head vs SAE detector), dict_size, k,
    and use_sparse_features; the stored args dict disambiguates what
    shapes cannot (window variant: identical parameters, different
    forward — reference model.py vs model_window_topk.py)."""
    from sls_tpu.config import ModelConfig, SAEConfig, XLSRConfig

    if "fc0.weight" in state:  # upstream SLS head (model_backup.py:186-201)
        return "sls", None

    if not any(k.startswith("sae.") for k in state):
        raise ValueError(
            "checkpoint has neither an SLS head (fc0.*) nor a SAE (sae.*); "
            f"keys look like: {sorted(state)[:6]} ..."
        )

    from sls_tpu.encoder.convert import infer_sae_config_from_state

    sae = infer_sae_config_from_state(state)
    args = meta.get("args", {})

    if variant == "auto":
        if args.get("use_cpc"):
            variant = "window_hard"  # CPC trains on hard windows (model_cpc.py)
        elif args.get("use_window_topk"):
            variant = "window_overlap"
        else:
            variant = "per_timestep"
    w = window_size or int(args.get("sae_window_size", 8) or 8)
    sae = SAEConfig(
        activation_dim=sae.activation_dim, dict_size=sae.dict_size,
        k=sae.k, variant=variant, window_size=w,
    )

    cls_in = state["classifier.1.weight"].shape[1]
    use_sparse = cls_in == sae.dict_size

    # encoder topology from weights (depth/width/ffn); conv strides are
    # not recoverable from shapes — they are the fixed wav2vec2 spec
    prefix = "ssl_model.model.encoder.layers."
    n_layers = 1 + max(
        int(k[len(prefix):].split(".")[0]) for k in state
        if k.startswith(prefix)
    )
    embed = state["ssl_model.model.post_extract_proj.weight"].shape[0]
    ffn = state["ssl_model.model.encoder.layers.0.fc1.weight"].shape[0]
    defaults = XLSRConfig()
    enc = XLSRConfig(
        encoder_layers=n_layers, embed_dim=embed, ffn_dim=ffn,
        num_heads=defaults.num_heads if embed == defaults.embed_dim
        else max(1, embed // 64),
    )
    mcfg = ModelConfig(
        encoder=enc, sae=sae, use_sae=True, use_sparse_features=use_sparse,
        classifier_hidden=state["classifier.1.weight"].shape[0],
    )
    return "sae", mcfg


def build_scorer(kind: str, state: Dict[str, np.ndarray], mcfg):
    """(jitted score fn, params) for either model family."""
    import jax
    import jax.numpy as jnp

    if kind == "sls":
        from sls_tpu.config import ModelConfig
        from sls_tpu.encoder.convert import sls_detector_state_to_flax
        from sls_tpu.models.sls import SLSDetector

        mcfg = mcfg or ModelConfig()
        variables = sls_detector_state_to_flax(state, mcfg)
        model = SLSDetector(mcfg)

        def fn(v, wav):
            return model.apply(v, wav, train=False)["score"]

        return jax.jit(fn), variables

    from sls_tpu.encoder.convert import detector_state_to_flax
    from sls_tpu.models.detector import Detector

    params = detector_state_to_flax(state, mcfg)
    model = Detector(mcfg)

    def fn(p, wav):
        return model.apply({"params": p}, wav, train=False)["score"]

    return jax.jit(fn), params


def score_index(index, score_fn, variables, out_path, batch_size: int,
                cut: int, num_threads: int = 4) -> int:
    """Reference score loop (main.py:158-199): batched forward, P(bonafide)
    per utterance, flush per batch.  Overlapped: while batch i computes on
    device, batch i+1 decodes on host threads."""
    from sls_tpu.data.pipeline import BatchLoader
    from sls_tpu.scores.writer import ScoreWriter

    loader = BatchLoader(index, batch_size, cut=cut,
                         num_threads=num_threads)
    n = 0

    def flush(pending, w):
        ids, valid, s = pending
        s = np.asarray(s)[valid]
        ids = [u for u, ok in zip(ids, valid) if ok]
        w.write_batch(ids, s)
        return len(ids)

    with ScoreWriter(out_path) as w:
        pending: Optional[Tuple] = None
        for batch in loader.epoch(0):
            # loader tail batches arrive padded to static shape with a
            # valid mask (duplicate tail-fill rows are dropped on write)
            scores = score_fn(variables, batch.wav)  # async dispatch
            if pending is not None:
                n += flush(pending, w)
            pending = (batch.utt_ids, batch.valid, scores)
        if pending is not None:
            n += flush(pending, w)
    return n


def diff_scores(ours_path, ref_path, tolerance: float) -> Dict[str, Any]:
    """Elementwise score-file comparison keyed on utterance id."""
    from sls_tpu.scores.writer import read_score_file

    our_ids, our_s = read_score_file(ours_path)
    ref_ids, ref_s = read_score_file(ref_path)
    ref_map = dict(zip(ref_ids, ref_s))
    our_map = dict(zip(our_ids, our_s))
    common = [u for u in our_ids if u in ref_map]
    if not common:
        return {"ok": False, "error": "no common utterance ids",
                "n_ours": len(our_ids), "n_ref": len(ref_ids)}
    ours = (np.asarray([our_map[u] for u in common])
            if len(common) != len(our_ids) else our_s)
    ref = np.asarray([ref_map[u] for u in common])
    d = np.abs(ours - ref)
    # decision flips at the P(bonafide)=0.5 boundary — what EER feels
    flips = int(((ours > 0.5) != (ref > 0.5)).sum())
    corr = float(np.corrcoef(ours, ref)[0, 1]) if len(common) > 1 else 1.0
    report = {
        "n_compared": len(common),
        "n_missing_in_ref": len(our_ids) - len(common),
        "n_missing_in_ours": sum(1 for u in ref_ids if u not in our_map),
        "max_abs_diff": float(d.max()),
        "mean_abs_diff": float(d.mean()),
        "pearson": corr,
        "decision_flips": flips,
        "tolerance": tolerance,
        "ok": bool(d.max() < tolerance),
    }
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="real-weights parity kit: convert, score, diff")
    p.add_argument("--cp_path", required=True,
                   help="reference PyTorch checkpoint (.pth)")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--wav_dir",
                     help="directory of .flac/.wav files to score")
    src.add_argument("--eval_list",
                     help="protocol file of utterance ids (one per line)")
    p.add_argument("--database_path",
                   help="base dir for --eval_list (<base>/flac/<utt>.flac)")
    p.add_argument("--ref_scores",
                   help="reference score file to diff against")
    p.add_argument("--out", default="scores_parity.txt")
    p.add_argument("--batch_size", type=int, default=36)
    p.add_argument("--cut_length", type=int, default=64600)
    p.add_argument("--num_utts", type=int, default=0,
                   help="cap utterances (0 = all)")
    p.add_argument("--variant", default="auto",
                   choices=["auto", "per_timestep", "window_overlap",
                            "window_hard"])
    p.add_argument("--window_size", type=int, default=0,
                   help="override SAE window size (0 = from checkpoint args)")
    p.add_argument("--tolerance", type=float, default=2e-3,
                   help="max |Δ P(bonafide)| gate for --ref_scores")
    p.add_argument("--config_json",
                   help="ExperimentConfig JSON overriding inferred "
                        "model topology (testing / nonstandard encoders)")
    p.add_argument("--fp32", action="store_true",
                   help="force fp32 + highest matmul precision (tight "
                        "numerics; default bf16 production path)")
    args = p.parse_args(argv)

    import jax

    if args.fp32:
        jax.config.update("jax_default_matmul_precision", "highest")

    state, meta = load_reference_checkpoint(args.cp_path)
    if args.config_json:
        from sls_tpu.config import ExperimentConfig, config_from_dict

        cfg = config_from_dict(
            ExperimentConfig, json.loads(Path(args.config_json).read_text())
        )
        kind = "sls" if "fc0.weight" in state else "sae"
        mcfg = cfg.model
    else:
        kind, mcfg = infer_architecture(
            state, meta, args.variant, args.window_size
        )
    print(f"checkpoint: {args.cp_path} (family: {kind}, "
          f"epoch: {meta.get('epoch')})")
    if mcfg is not None and mcfg.use_sae:
        print(f"inferred: dict={mcfg.sae.dict_size} k={mcfg.sae.k} "
              f"variant={mcfg.sae.variant} w={mcfg.sae.window_size} "
              f"sparse_features={mcfg.use_sparse_features} "
              f"layers={mcfg.encoder.encoder_layers} "
              f"embed={mcfg.encoder.embed_dim}")

    if args.fp32 and mcfg is not None:
        import dataclasses

        import jax.numpy as jnp

        mcfg = dataclasses.replace(
            mcfg, encoder=dataclasses.replace(mcfg.encoder, dtype=jnp.float32)
        )

    score_fn, variables = build_scorer(kind, state, mcfg)

    from sls_tpu.data.pipeline import DatasetIndex

    if args.wav_dir:
        wavs = sorted(
            list(Path(args.wav_dir).glob("*.flac"))
            + list(Path(args.wav_dir).glob("*.wav"))
        )
        if not wavs:
            print(f"no .flac/.wav files in {args.wav_dir}", file=sys.stderr)
            return 1
        index = DatasetIndex(
            utt_ids=[w.stem for w in wavs], paths=wavs)
    else:
        if not args.database_path:
            p.error("--eval_list requires --database_path")
        utts = [
            line.split()[0] for line in
            Path(args.eval_list).read_text().splitlines() if line.strip()
        ]
        index = DatasetIndex.for_eval(utts, args.database_path)
    if args.num_utts:
        index = DatasetIndex(
            utt_ids=index.utt_ids[: args.num_utts],
            paths=index.paths[: args.num_utts],
        )

    n = score_index(index, score_fn, variables, args.out,
                    args.batch_size, args.cut_length)
    print(f"scored {n} utterances -> {args.out}")

    if not args.ref_scores:
        return 0
    report = diff_scores(args.out, args.ref_scores, args.tolerance)
    print(json.dumps(report, indent=2))
    return 0 if report.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())
