"""Analysis CLI — the reference's ~35 analyze_*/probe_*/evaluate_* scripts
as subcommands of one tool.

    python -m sls_tpu.cli.analyze <command> --run_dir <dir> [options]

Commands (reference script equivalents):
  temporal     analyze_temporal_stability.py, analyze_window_limitations.py
  sparsity     evaluate_sparsity.py, evaluate_window_topk_sparsity.py,
               simple_sparsity_check.py
  attribution  analyze_decision_relevance.py (gradient + ablation + cues)
  importance   analyze_sae_neurons.py, per-model analyze_feature_importance
  probe        probe_acoustic_asvspoof.py (acoustic correlation probe)
  handcrafted  compare_handcrafted_features.py
  overlap      eval_overlap_clean.py / eval_overlap_eer.py
  gates        SLS sensitive-layer gate profile (per class, with PNG) —
               the SLS family's interpretability question
               (model_backup.py:186-192 fullfeature gate weights)

Each command writes a JSON report (and optionally PNG dashboards) to
--output.  The model is rebuilt from the checkpoint's embedded config
(checkpoint-as-config, reference: test_interpretability.py:33-47);
data comes from dataset dirs or --synthetic for smoke runs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def load_experiment(run_dir: str, checkpoint: Optional[str] = None):
    """Rebuild (cfg, model, params) from a run directory's checkpoint."""
    import jax.numpy as jnp

    from sls_tpu.ckpt.checkpoint import CheckpointManager, load_checkpoint
    from sls_tpu.config import ExperimentConfig, config_from_dict
    from sls_tpu.models.detector import Detector

    mgr = CheckpointManager(run_dir)
    path = mgr.resolve_resume(checkpoint)
    if path is None:
        raise FileNotFoundError(f"no checkpoint in {run_dir}")
    raw, meta = load_checkpoint(path)
    cfg = config_from_dict(ExperimentConfig, json.loads(meta["config_json"]))
    if cfg.model.encoder.int8_serving:
        # analysis needs exact fp numerics AND differentiability:
        # jax.grad through the int8 path's round() is zero a.e., which
        # would silently null gradient attribution.  A checkpoint from
        # an --int8 serving run analyzes in the bf16 path it trained in.
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                encoder=dataclasses.replace(
                    cfg.model.encoder, int8_serving=False),
            ),
        )
    params = raw["state"]["params"] if "state" in raw else raw["params"]
    if "sls_head" in params:
        raise SystemExit(
            "this run dir holds an SLS-family checkpoint (params carry "
            "'sls_head'); the SAE analysis suite needs a detector run — "
            "for SLS interpretability use: analyze gates --run_dir ...")
    model = Detector(cfg.model)
    return cfg, model, params


def load_sls_experiment(run_dir: str, checkpoint: Optional[str] = None):
    """Rebuild (cfg, model, params, batch_stats) for an SLS-family run."""
    from sls_tpu.ckpt.checkpoint import CheckpointManager, load_checkpoint
    from sls_tpu.config import ExperimentConfig, config_from_dict
    from sls_tpu.models.sls import SLSDetector

    mgr = CheckpointManager(run_dir)
    path = mgr.resolve_resume(checkpoint)
    if path is None:
        raise FileNotFoundError(f"no checkpoint in {run_dir}")
    raw, meta = load_checkpoint(path)
    cfg = config_from_dict(ExperimentConfig, json.loads(meta["config_json"]))
    if cfg.model.encoder.int8_serving:
        # same rule as load_experiment: analysis wants the exact fp
        # numerics the model trained in, not the serving quantization
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                encoder=dataclasses.replace(
                    cfg.model.encoder, int8_serving=False),
            ),
        )
    state = raw.get("state", raw)
    params = state["params"]
    if "sls_head" not in params:
        raise SystemExit(
            "'gates' needs an SLS-family checkpoint (params carrying "
            "'sls_head'); this run dir holds a detector run — use the "
            "SAE analysis commands instead")
    return cfg, SLSDetector(cfg.model), params, state.get("batch_stats", {})


def _collect_codes(model, params, loader, max_samples: int):
    """Run batches through encode_sae; returns (codes, wavs, labels)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def enc(params, wav):
        return model.apply({"params": params}, wav, method="encode_sae")

    codes, wavs, labels = [], [], []
    n = 0
    for batch in loader.epoch(0):
        out = enc(params, jnp.asarray(batch.wav))
        v = batch.valid
        codes.append(np.asarray(out["codes"])[v])
        wavs.append(batch.wav[v])
        if batch.labels is not None:
            labels.append(batch.labels[v])
        n += int(v.sum())
        if n >= max_samples:
            break
    return (
        np.concatenate(codes)[:max_samples],
        np.concatenate(wavs)[:max_samples],
        np.concatenate(labels)[:max_samples] if labels else None,
    )


def _make_loader(args, cfg):
    """Dataset loader from dirs, or a synthetic loader for smoke runs."""
    from sls_tpu.data.pipeline import ArrayLoader, BatchLoader, DatasetIndex
    from sls_tpu.data.protocols import parse_train_protocol

    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        n = max(args.num_samples, 2 * args.batch_size)
        wavs = rng.normal(0, 0.1, (n, cfg.train.cut_length)).astype(np.float32)
        labels = rng.integers(0, 2, n)
        return ArrayLoader(wavs, labels, batch_size=args.batch_size)

    if not args.protocol or not args.database_path:
        raise SystemExit(
            "ERROR: provide --protocol and --database_path for dataset "
            "analysis, or use --synthetic for a smoke run"
        )
    labels_map, ids = parse_train_protocol(args.protocol)
    index = DatasetIndex.for_train(ids, labels_map, args.database_path,
                                   ext=args.audio_ext)
    return BatchLoader(index, args.batch_size, cut=cfg.train.cut_length)


def cmd_temporal(args, cfg, model, params, loader):
    from sls_tpu.analysis.temporal import multi_scale_structure, temporal_summary

    codes, _, _ = _collect_codes(model, params, loader, args.num_samples)
    w = cfg.model.sae.window_size
    report = {
        "summary": temporal_summary(codes, w),
        "multi_scale": multi_scale_structure(codes),
        "num_samples": int(codes.shape[0]),
    }
    if args.figures:
        from sls_tpu.analysis.temporal import (
            jaccard_consecutive,
            transient_persistent_split,
        )
        from sls_tpu.analysis.visualize import plot_temporal_stability

        life = transient_persistent_split(codes, w)["lifetime"]
        report["figures"] = [plot_temporal_stability(
            jaccard_consecutive(codes), w,
            Path(args.figures) / "temporal_stability.png",
            lifetimes=life[life > 0],
        )]
    return report


def cmd_sparsity(args, cfg, model, params, loader):
    from sls_tpu.analysis.sparsity import sparsity_stats, weight_diagnostics

    codes, _, _ = _collect_codes(model, params, loader, args.num_samples)
    return {
        "activations": sparsity_stats(codes),
        "weights": weight_diagnostics(np.asarray(params["sae"]["W_dec"])),
        "expected_k": cfg.model.sae.k,
    }


def cmd_attribution(args, cfg, model, params, loader):
    import jax.numpy as jnp

    from sls_tpu.analysis.attribution import (
        ablation_attribution,
        attribution_scores,
        top_k_cues,
        within_class_cue_consistency,
    )

    codes, _, labels = _collect_codes(model, params, loader, args.num_samples)
    scores = attribution_scores(model, params, jnp.asarray(codes))
    cues = top_k_cues(scores, k=args.top_k)
    report = {
        "num_samples": int(codes.shape[0]),
        "top_cues_per_sample": cues.tolist(),
    }
    if labels is not None:
        report["cue_consistency"] = within_class_cue_consistency(cues, labels)
    if args.ablation:
        global_top = np.argsort(-scores.sum(0))[: args.top_k]
        deltas = ablation_attribution(model, params, jnp.asarray(codes),
                                      global_top)
        report["ablation"] = {
            "features": global_top.tolist(),
            "mean_prob_drop": deltas.mean(0).tolist(),
        }
    if args.figures:
        from sls_tpu.analysis.visualize import plot_attribution_report

        report["figures"] = [plot_attribution_report(
            np.asarray(scores),
            Path(args.figures) / "decision_relevance.png",
            top_k=args.top_k,
            consistency=report.get("cue_consistency"),
            ablation=report.get("ablation"),
        )]
    return report


def cmd_importance(args, cfg, model, params, loader):
    from sls_tpu.analysis.importance import (
        class_feature_importance,
        interpretability_info,
    )

    codes, _, labels = _collect_codes(model, params, loader, args.num_samples)
    info = interpretability_info(codes)
    report = {"mean_sparsity": float(info["sparsity"].mean())}
    if labels is not None:
        imp = class_feature_importance(info["avg_activation"], labels)
        report["most_discriminative_features"] = imp[
            "most_discriminative_features"
        ].tolist()
        report["discriminative_scores"] = imp["discriminative_scores"].tolist()
        if args.figures:
            from sls_tpu.analysis.importance import per_feature_class_stats
            from sls_tpu.analysis.visualize import plot_feature_statistics

            report["figures"] = [plot_feature_statistics(
                per_feature_class_stats(codes, labels),
                Path(args.figures) / "feature_statistics.png",
                top_k=args.top_k,
            )]
    return report


def cmd_probe(args, cfg, model, params, loader):
    from sls_tpu.analysis.probes import acoustic_probe

    codes, wavs, _ = _collect_codes(model, params, loader, args.num_samples)
    out = acoustic_probe(codes, wavs, top_k=args.top_k)
    report = {
        prop: {
            "top_features": d["top_features"].tolist(),
            "top_correlations": d["top_correlations"].tolist(),
        }
        for prop, d in out.items()
    }
    if args.figures:
        from sls_tpu.analysis.visualize import plot_acoustic_probe

        report["figures"] = [plot_acoustic_probe(
            {k: v for k, v in report.items() if k != "figures"},
            Path(args.figures) / "acoustic_probe.png",
        )]
    return report


def cmd_handcrafted(args, cfg, model, params, loader):
    from sls_tpu.analysis.probes import handcrafted_stability_comparison

    codes, wavs, _ = _collect_codes(model, params, loader, args.num_samples)
    return handcrafted_stability_comparison(codes, wavs)


def cmd_overlap(args, cfg, model, params, loader):
    from sls_tpu.evaluation.overlap import overlap_stability_eval

    res = overlap_stability_eval(
        model, params, loader, window=cfg.model.sae.window_size,
        max_samples=args.num_samples,
    )
    res.pop("scores")  # keep the JSON small; scores go via the eval CLI
    return res


def cmd_inspect(args, cfg, model, params, loader):
    """Checkpoint smoke test: architecture introspection from weights +
    dummy-audio forward + interpretability quality score 0-3
    (reference: test_interpretability.py:17-191)."""
    import jax
    import jax.numpy as jnp

    report = {"config": json.loads(json.dumps(
        {"sae_dict_size": cfg.model.sae.dict_size,
         "sae_k": cfg.model.sae.k,
         "variant": cfg.model.sae.variant,
         "use_sparse_features": cfg.model.use_sparse_features}))}

    # architecture inferred from weight shapes (checkpoint-as-config check)
    w_enc = np.asarray(params["sae"]["W_enc"])
    cls_in = np.asarray(params["classifier"]["fc1"]["kernel"]).shape[0]
    report["inferred"] = {
        "activation_dim": int(w_enc.shape[0]),
        "dict_size": int(w_enc.shape[1]),
        "classifier_input_dim": int(cls_in),
        "uses_sparse_features": bool(cls_in == w_enc.shape[1]),
    }
    consistent = (
        report["inferred"]["dict_size"] == cfg.model.sae.dict_size
        and report["inferred"]["uses_sparse_features"]
        == cfg.model.use_sparse_features
    )
    report["config_weight_consistency"] = bool(consistent)

    # dummy forward + quality scoring
    rng = np.random.default_rng(args.seed)
    wav = jnp.asarray(
        rng.normal(0, 0.1, (2, cfg.train.cut_length)).astype(np.float32)
    )
    out = model.apply({"params": params}, wav, train=False)
    codes = np.asarray(out["codes"])
    active_per_frame = (codes > 0).sum(-1).mean()
    feature_diversity = ((codes > 0).any(axis=(0, 1))).mean()
    finite = bool(np.isfinite(np.asarray(out["log_probs"])).all())

    quality = int(finite) \
        + int(0 < active_per_frame <= cfg.model.sae.k) \
        + int(feature_diversity > 0.01)
    report["forward"] = {
        "finite_outputs": finite,
        "mean_active_per_frame": float(active_per_frame),
        "feature_diversity": float(feature_diversity),
        "quality_score": quality,  # 0-3
    }
    return report


def cmd_compare(args, cfg, model, params, loader):
    """Side-by-side temporal metrics for two checkpoints
    (reference: compare_temporal_models.py, compare_temporal_stability.py)."""
    from sls_tpu.analysis.temporal import temporal_summary

    codes, _, _ = _collect_codes(model, params, loader, args.num_samples)
    report = {"primary": temporal_summary(codes, cfg.model.sae.window_size)}
    if args.compare_run_dir:
        cfg2, model2, params2 = load_experiment(args.compare_run_dir)
        codes2, _, _ = _collect_codes(model2, params2, loader,
                                      args.num_samples)
        report["secondary"] = temporal_summary(
            codes2, cfg2.model.sae.window_size
        )
        report["delta"] = {
            k: report["secondary"][k] - report["primary"][k]
            for k in report["primary"]
            if isinstance(report["primary"][k], float)
        }
    return report


def cmd_failure(args, cfg, model, params, loader):
    """Boundary-error correlation + transient spikes + discriminative
    transients (reference: analyze_boundary_error_correlation.py,
    analyze_window_limitations.py, improved_transient_analysis.py)."""
    import jax
    import jax.numpy as jnp

    from sls_tpu.analysis.failure_modes import (
        boundary_error_correlation,
        discriminative_transients_probe,
        transient_spike_stats,
    )

    codes, wavs, labels = _collect_codes(model, params, loader,
                                         args.num_samples)
    report = {"spikes": transient_spike_stats(codes)}
    correct = None
    if labels is not None:
        logp = np.asarray(
            jax.jit(
                lambda p, c: model.apply({"params": p}, jnp.asarray(c),
                                         method="classify_codes")
            )(params, codes)
        )
        correct = np.argmax(logp, -1) == labels
        report["boundary_error_correlation"] = boundary_error_correlation(
            codes, correct, cfg.model.sae.window_size
        )
        report["discriminative_transients"] = discriminative_transients_probe(
            codes, labels
        )
    if args.figures:
        from sls_tpu.analysis.temporal import transient_persistent_split
        from sls_tpu.analysis.visualize import (
            plot_boundary_discontinuity,
            plot_transient_persistent,
        )

        figdir = Path(args.figures)
        dt = report.get("discriminative_transients")
        thr = (dt["lifetime_threshold"] if dt
               else float(np.median(
                   transient_persistent_split(codes, 1.0)["lifetime"]) or 1.0))
        report["figures"] = [
            plot_boundary_discontinuity(
                codes, cfg.model.sae.window_size,
                figdir / "boundary_discontinuity_analysis.png",
                correct=correct,
            ),
            plot_transient_persistent(
                transient_persistent_split(codes, thr)["lifetime"], thr,
                figdir / "transient_vs_persistent.png",
                probe_acc=dt,
            ),
        ]
    return report


def cmd_global_cues(args, cfg, model, params, loader):
    """Utterance-global cue consistency
    (reference: analyze_global_cue_consistency.py)."""
    from sls_tpu.analysis.failure_modes import global_cue_consistency

    codes, _, _ = _collect_codes(model, params, loader, args.num_samples)
    return global_cue_consistency(codes, top_k=args.top_k)


def cmd_gates(args):
    """SLS layer-gate interpretability: which encoder layers does the
    head consider sensitive?  The question the Sensitive-Layer-Selection
    architecture exists to answer (heads/sls.py getAttenF gates;
    reference model_backup.py:186-192's fullfeature weights).  Loads an
    SLS run dir directly (the other commands analyze detector runs)."""
    import jax.numpy as jnp

    from sls_tpu.models.sls import layer_gate_profile

    cfg, model, params, batch_stats = load_sls_experiment(
        args.run_dir, args.checkpoint)
    loader = _make_loader(args, cfg)
    wavs, labels, n = [], [], 0
    for batch in loader.epoch(0):
        v = batch.valid
        wavs.append(batch.wav[v])
        if batch.labels is not None:
            labels.append(batch.labels[v])
        n += int(v.sum())
        if n >= args.num_samples:
            break
    wav = np.concatenate(wavs)[: args.num_samples]
    report = layer_gate_profile(
        model, params, batch_stats, jnp.asarray(wav), return_gates=True)
    gates = report.pop("gates")  # [L, B] — one encoder forward for all
    if labels:
        lab = np.concatenate(labels)[: args.num_samples]
        # per-class gate means: do spoof and bonafide utterances light
        # up different layers?
        for cls, name in ((0, "spoof"), (1, "bonafide")):
            sel = lab == cls
            if sel.any():
                report[f"mean_gate_per_layer_{name}"] = (
                    gates[:, sel].mean(axis=1).tolist())
    if args.figures:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mean = np.asarray(report["mean_gate_per_layer"])
        std = np.asarray(report["std_gate_per_layer"])
        fig, ax = plt.subplots(figsize=(9, 3.5))
        ax.bar(np.arange(len(mean)), mean, yerr=std, color="#4878a8")
        ax.set_xlabel("encoder layer")
        ax.set_ylabel("mean sigmoid gate")
        ax.set_title("SLS sensitive-layer gates")
        out_dir = Path(args.figures)
        out_dir.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_dir / "layer_gates.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)
    return report


COMMANDS = {
    "temporal": cmd_temporal,
    "sparsity": cmd_sparsity,
    "attribution": cmd_attribution,
    "importance": cmd_importance,
    "probe": cmd_probe,
    "handcrafted": cmd_handcrafted,
    "overlap": cmd_overlap,
    "inspect": cmd_inspect,
    "compare": cmd_compare,
    "failure": cmd_failure,
    "global-cues": cmd_global_cues,
    "gates": cmd_gates,
}


def build_parser():
    p = argparse.ArgumentParser(description="sls_tpu analysis suite")
    p.add_argument("command", choices=sorted(COMMANDS))
    p.add_argument("--run_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None, help="JSON report path")
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--top_k", type=int, default=20)
    p.add_argument("--ablation", action="store_true")
    p.add_argument("--database_path", default=None)
    p.add_argument("--protocol", default=None)
    p.add_argument("--audio_ext", default="flac")
    p.add_argument("--figures", default=None,
                   help="directory for PNG dashboards (the reference "
                        "scripts' figure outputs); emitted by temporal/"
                        "attribution/importance/probe/failure")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic audio smoke run (no dataset needed)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compare_run_dir", default=None,
                   help="second run dir for the 'compare' command")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "gates":
        # SLS-family command: loads its own model (detector loading
        # fails loud on SLS checkpoints and vice versa)
        report = cmd_gates(args)
    else:
        cfg, model, params = load_experiment(args.run_dir, args.checkpoint)
        loader = _make_loader(args, cfg)
        report = COMMANDS[args.command](args, cfg, model, params, loader)
    text = json.dumps(report, indent=2, default=float)
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(text)
        print(f"wrote {args.output}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
