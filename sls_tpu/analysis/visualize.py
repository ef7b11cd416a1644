"""PNG dashboards for the analysis suite.

Matplotlib figure builders equivalent to the reference's plotting scripts:
- feature statistics dashboard (reference: analyze_sae_neurons.py:245
  visualize_features)
- temporal-stability / boundary-discontinuity figure (reference:
  analyze_boundary_semantics.py -> boundary_discontinuity_analysis.png)
- decision-feature activation vs mel-spectrogram panels (reference:
  visualize_decision_features.py)

All functions return the saved path; Agg backend, no display needed.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_feature_statistics(
    stats: Dict[str, np.ndarray], out_path, top_k: int = 30
) -> str:
    """Dashboard from per_feature_class_stats output: class means,
    selectivity ranking, activation-frequency histogram."""
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))

    sel = np.asarray(stats["selectivity"])
    order = np.argsort(-sel)[:top_k]
    axes[0, 0].bar(range(len(order)), sel[order], color="tab:purple")
    axes[0, 0].set_title(f"top-{top_k} selective features")
    axes[0, 0].set_xlabel("rank")
    axes[0, 0].set_ylabel("|freq(bona) - freq(spoof)|")

    axes[0, 1].scatter(stats["bonafide_freq"], stats["spoof_freq"], s=4,
                       alpha=0.4)
    axes[0, 1].plot([0, 1], [0, 1], "k--", lw=0.5)
    axes[0, 1].set_xlabel("bonafide activation freq")
    axes[0, 1].set_ylabel("spoof activation freq")
    axes[0, 1].set_title("per-feature class frequencies")

    axes[1, 0].hist(stats["bonafide_mean"], bins=50, alpha=0.6,
                    label="bonafide")
    axes[1, 0].hist(stats["spoof_mean"], bins=50, alpha=0.6, label="spoof")
    axes[1, 0].set_title("mean activation distribution")
    axes[1, 0].legend()

    both = np.asarray(stats["bonafide_freq"]) + np.asarray(stats["spoof_freq"])
    axes[1, 1].hist(both, bins=50, color="tab:gray")
    axes[1, 1].set_title("overall activation frequency")

    fig.tight_layout()
    out_path = str(out_path)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_temporal_stability(
    jaccard_trace: np.ndarray, window: int, out_path,
    lifetimes: Optional[np.ndarray] = None,
) -> str:
    """Per-frame Jaccard trace with window-boundary markers + lifetime
    histogram (the boundary-discontinuity figure)."""
    n_panels = 2 if lifetimes is not None else 1
    fig, axes = plt.subplots(n_panels, 1, figsize=(12, 4 * n_panels),
                             squeeze=False)

    trace = np.asarray(jaccard_trace)
    mean_trace = trace.mean(axis=0) if trace.ndim == 2 else trace
    ax = axes[0, 0]
    ax.plot(mean_trace, lw=1.0, label="frame-to-frame Jaccard")
    for b in range(window - 1, len(mean_trace), window):
        ax.axvline(b, color="tab:red", alpha=0.3, lw=0.8)
    ax.set_xlabel("frame transition")
    ax.set_ylabel("Jaccard")
    ax.set_title(f"temporal stability (window boundaries every {window})")
    ax.legend()

    if lifetimes is not None:
        axes[1, 0].hist(np.asarray(lifetimes), bins=40, color="tab:green")
        axes[1, 0].set_title("feature lifetime distribution (frames)")

    fig.tight_layout()
    out_path = str(out_path)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_decision_features(
    wav: np.ndarray,
    codes: np.ndarray,
    feature_ids: Sequence[int],
    out_path,
    sr: int = 16000,
) -> str:
    """Mel-spectrogram with aligned activation traces of the top decision
    features for one utterance."""
    from sls_tpu.analysis.dsp import mel_spectrogram

    mel = mel_spectrogram(np.asarray(wav), sr=sr)  # [T, n_mels]
    T = min(len(mel), codes.shape[0])

    fig, axes = plt.subplots(2, 1, figsize=(12, 7), sharex=True,
                             gridspec_kw={"height_ratios": [2, 1]})
    axes[0].imshow(mel[:T].T, aspect="auto", origin="lower",
                   cmap="magma")
    axes[0].set_ylabel("mel bin")
    axes[0].set_title("mel spectrogram")

    for fid in feature_ids:
        axes[1].plot(codes[:T, fid], lw=1.0, label=f"f{fid}")
    axes[1].set_xlabel("frame")
    axes[1].set_ylabel("activation")
    axes[1].set_title("top decision features")
    axes[1].legend(ncol=min(len(feature_ids), 5), fontsize=8)

    fig.tight_layout()
    out_path = str(out_path)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
