"""Overlap-window evaluation: joint scoring + temporal-stability pass,
and full-utterance windowed scoring.

Re-provides the reference's eval_overlap family in one clean driver
(reference: eval_overlap_clean.py — stability of the overlap-window
model's SAE codes; eval_overlap_eer.py — EER of the overlap model;
overlap_eer_results.json / overlap_eval_5k_results.json artifacts), plus
the natural extension those scripts gesture at: variable-length
utterances scored by overlapping 64,600-sample waveform windows
(BASELINE config #5, streamed In-the-Wild eval).

One forward pass serves both numbers: the jitted step returns scores AND
sparse codes, so the stability statistics come for free with scoring
(the reference ran separate jobs for each).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sls_tpu.analysis.temporal import boundary_discontinuity, mean_temporal_jaccard
from sls_tpu.metrics.eer import compute_eer


def make_scoring_step(model, mesh=None):
    """Jitted step returning scores + active-feature masks."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step(params, wav):
        out = model.apply({"params": params}, wav, train=False)
        return {
            "score": out["score"],
            "active": (out["codes"] > 0).astype(jnp.bfloat16),
        }

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data), out_shardings=None)


def overlap_stability_eval(
    model,
    params,
    loader,
    window: int = 8,
    mesh=None,
    labels: Optional[Dict[str, int]] = None,
    max_samples: Optional[int] = None,
) -> Dict:
    """Score every utterance and accumulate overlap-boundary stability.

    Returns the overlap_eer_results.json-shaped dict: per-utterance
    scores, interior/boundary Jaccard at the overlap stride, mean
    Jaccard, and EER when labels are given.
    """
    from sls_tpu.parallel.mesh import pad_batch_to_devices, shard_batch

    step = make_scoring_step(model, mesh)
    scores: Dict[str, float] = {}
    interior, boundary, jaccard = [], [], []
    n_seen = 0

    def consume(out, utt_ids, v):
        nonlocal n_seen
        s = np.asarray(out["score"])
        active = np.asarray(out["active"], dtype=np.float32)
        for utt, ok, score in zip(utt_ids, v, s):
            if ok:
                scores[utt] = float(score)
        # weight per-batch means by their valid count, so a small final
        # partial batch doesn't get equal say with full batches
        bsz = int(v.sum())
        stats = boundary_discontinuity(active[v], window, overlap=True)
        interior.append((stats["interior_jaccard"], bsz))
        boundary.append((stats["boundary_jaccard"], bsz))
        jaccard.append((mean_temporal_jaccard(active[v]), bsz))
        n_seen += bsz

    # windowed software pipeline (same pattern as train/loop.py r5):
    # dispatch runs a few batches ahead of the draining fetch, so the
    # [B, T, dict] activation-mask transfer and the host-side stability
    # stats overlap device compute instead of serializing against it.
    # Depth 2 bounds pending fetches (~tens of MB each at b64/dict4096).
    pending = []
    for batch in loader.epoch(0):
        if mesh is not None:
            wav_np, _, v = pad_batch_to_devices(
                mesh, batch.wav, None, batch.valid
            )
            wav = shard_batch(jnp.asarray(wav_np), mesh)
        else:
            wav, v = jnp.asarray(batch.wav), batch.valid
        pending.append((step(params, wav), batch.utt_ids, v))
        if len(pending) > 2:
            consume(*pending.pop(0))
        if max_samples is not None and n_seen >= max_samples:
            break
    for args in pending:
        if max_samples is not None and n_seen >= max_samples:
            break
        consume(*args)

    def wmean(pairs, default=1.0):
        tot = sum(w for _, w in pairs)
        if not tot:
            return default
        return float(sum(v * w for v, w in pairs) / tot)

    interior_m = wmean(interior)
    boundary_m = wmean(boundary)
    result = {
        "num_samples": n_seen,
        "scores": scores,
        "temporal_stability": {
            "mean_jaccard": wmean(jaccard),
            "interior": interior_m,
            "boundary": boundary_m,
            "discontinuity_pct": 100.0 * (interior_m - boundary_m)
            / max(interior_m, 1e-12),
        },
    }
    if labels:
        bona = np.array([s for u, s in scores.items() if labels.get(u) == 1])
        spoof = np.array([s for u, s in scores.items() if labels.get(u) == 0])
        if len(bona) and len(spoof):
            eer, _ = compute_eer(bona, spoof)
            result["eer_pct"] = 100.0 * eer
    return result


# ---------------------------------------------------------------------------
# Full-utterance windowed scoring (variable-length audio)


def extract_windows(
    wav: np.ndarray, window: int = 64600, stride: Optional[int] = None
) -> np.ndarray:
    """Overlapping fixed-size windows over a full utterance.

    Short audio is repeat-tiled to one window (the reference ``pad``);
    the final window is right-aligned so the tail is always covered.
    Returns [n_windows, window].
    """
    stride = stride or window // 2
    n = wav.shape[0]
    if n <= window:
        from sls_tpu.data.audio import pad_or_tile

        return pad_or_tile(wav, window)[None, :]
    starts = list(range(0, n - window + 1, stride))
    if starts[-1] + window < n:
        starts.append(n - window)
    return np.stack([wav[s : s + window] for s in starts])


# jitted forward per MODEL, not per call: a fresh @jax.jit closure per
# utterance would re-trace and re-compile for every single clip (hours
# of pure recompilation over an In-the-Wild-scale set).  Keyed on the
# model object itself (held strongly, so ids can't be recycled); bounded
# so a checkpoint sweep constructing many models can't accumulate
# unbounded compiled programs.
_FWD_CACHE: Dict[int, tuple] = {}
_FWD_CACHE_MAX = 4


def _scoring_fwd(model):
    entry = _FWD_CACHE.get(id(model))
    if entry is not None and entry[0] is model:
        return entry[1]

    @jax.jit
    def fwd(params, w):
        return model.apply({"params": params}, w, train=False)["score"]

    while len(_FWD_CACHE) >= _FWD_CACHE_MAX:  # FIFO eviction
        _FWD_CACHE.pop(next(iter(_FWD_CACHE)))
    _FWD_CACHE[id(model)] = (model, fwd)
    return fwd


def score_full_utterance(
    model, params, wav: np.ndarray, window: int = 64600,
    stride: Optional[int] = None, batch_size: int = 16,
    aggregate: str = "mean",
) -> Dict[str, float]:
    """Score one variable-length utterance with overlapping windows.

    Window scores are aggregated to a single P(bonafide):
    'mean' (default), 'min' (a single spoofed span flags the clip), or
    'max'.  Window count is padded to the batch size so XLA sees at most
    ceil(n/batch) static shapes.
    """
    windows = extract_windows(np.asarray(wav, np.float32), window, stride)
    n = len(windows)
    fwd = _scoring_fwd(model)
    scores = []
    for lo in range(0, n, batch_size):
        chunk = windows[lo : lo + batch_size]
        if len(chunk) < batch_size:  # static shape: tile
            reps = int(np.ceil(batch_size / len(chunk)))
            padded = np.tile(chunk, (reps, 1))[:batch_size]
            s = np.asarray(fwd(params, jnp.asarray(padded)))[: len(chunk)]
        else:
            s = np.asarray(fwd(params, jnp.asarray(chunk)))
        scores.append(s)
    window_scores = np.concatenate(scores)

    agg = {"mean": np.mean, "min": np.min, "max": np.max}[aggregate]
    return {
        "score": float(agg(window_scores)),
        "n_windows": n,
        "window_scores": window_scores,
    }


def score_utterances_streamed(
    model,
    params,
    audio_iter,
    window: int = 64600,
    stride: Optional[int] = None,
    batch_size: int = 32,
    aggregate: str = "mean",
):
    """Streamed full-utterance scoring over many variable-length clips.

    The production path for In-the-Wild-scale overlap eval (BASELINE
    config #5, ~32k utterances): windows from different utterances are
    packed into ONE fixed-size batch stream, so short clips never waste
    device steps and exactly one program is compiled.

    audio_iter yields (utt_id, waveform) pairs; yields (utt_id, score)
    in SUBMISSION order (a long head utterance delays later finished
    ones — keeps score files deterministic and memory bounded by the
    longest clip).
    """
    stride = stride or window // 2
    fwd = _scoring_fwd(model)  # compiled once per model, cached
    agg = {"mean": np.mean, "min": np.min, "max": np.max}[aggregate]

    pending_windows = []  # list of (utt_id, window array)
    counts: Dict[str, int] = {}
    acc: Dict[str, list] = {}
    order: list = []

    def flush_ready():
        while order and len(acc[order[0]]) == counts[order[0]]:
            utt = order.pop(0)
            yield utt, float(agg(np.asarray(acc.pop(utt))))
            counts.pop(utt)

    in_flight: list = []  # (rows, device score array) — r5 pipeline

    def drain_one():
        rows, dev = in_flight.pop(0)
        scores = np.asarray(dev)[: len(rows)]  # the only host sync
        for (utt, _), s in zip(rows, scores):
            acc[utt].append(float(s))

    def run_batch(rows):
        wavs = np.stack([w for _, w in rows])
        if len(wavs) < batch_size:
            reps = int(np.ceil(batch_size / len(wavs)))
            wavs = np.tile(wavs, (reps, 1))[:batch_size]
        # async dispatch; the fetch happens a couple of batches later
        # (windowed pipeline, same pattern as train/loop.py r5) so
        # window extraction + stacking of the next clips overlaps
        # device compute
        in_flight.append((rows, fwd(params, jnp.asarray(wavs))))
        if len(in_flight) > 2:
            drain_one()

    for utt_id, wav in audio_iter:
        wins = extract_windows(np.asarray(wav, np.float32), window, stride)
        counts[utt_id] = len(wins)
        acc[utt_id] = []
        order.append(utt_id)
        pending_windows.extend((utt_id, w) for w in wins)
        while len(pending_windows) >= batch_size:
            run_batch(pending_windows[:batch_size])
            del pending_windows[:batch_size]
            yield from flush_ready()

    if pending_windows:
        run_batch(pending_windows)
        pending_windows.clear()
    while in_flight:
        drain_one()
    yield from flush_ready()


def length_buckets(enc_cfg, t_targets=(256, 512, 1280, 2560, 5120)) -> Dict[int, int]:
    """{frame_count: min waveform samples} for un-windowed scoring.

    Targets are multiples of 256 so the long-T attention kernel's
    block constraint holds (kernels/flash_attention.py) and every
    clip compiles to one of len(t_targets) programs.  Inverts
    ``enc_cfg.num_frames`` by upward search from the analytic stride
    bound (total stride = product of conv strides; 320 for XLS-R)."""
    stride = 1
    for _, _, s in enc_cfg.conv_layers:
        stride *= s
    out = {}
    for t in t_targets:
        lo = stride * (t - 1)
        while enc_cfg.num_frames(lo) < t:
            lo += max(1, stride // 10)
        out[t] = lo
    return out


def score_utterances_unwindowed(
    model,
    params,
    audio_iter,
    enc_cfg,
    t_targets=(256, 512, 1280, 2560, 5120),
    sp_mesh=None,
):
    """Un-windowed full-utterance scoring: ONE forward per clip with the
    whole waveform in context.

    Unlike the overlap-window path (score_utterances_streamed), the
    classifier mean-pools over the clip's entire frame sequence, so
    cross-window cues (global channel artifacts, long-range prosody)
    are visible to the score — the capability the reference's
    eval_overlap family approximates with 50%-overlap windows.

    Clips are padded (repeat-tiled, reference ``pad`` semantics) up to
    the nearest length bucket; clips longer than the largest bucket are
    chunked at that bucket and their scores averaged.  T buckets are
    multiples of 256, so attention runs through the long-T VMEM kernel
    when ``enc_cfg.flash_long_t`` admits it.

    With ``sp_mesh`` (a ('data','seq') mesh, parallel/sequence.py) each
    forward runs sequence-parallel: the clip's frame axis is sharded
    over the 'seq' devices, so one long utterance uses the whole mesh.
    ``model`` must be built with ``sp_model_config`` in that case.

    Yields (utt_id, score, n_frames_bucket) in input order.
    """
    from sls_tpu.data.audio import pad_or_tile

    buckets = length_buckets(enc_cfg, t_targets)  # {T: samples}
    sample_sizes = sorted(buckets.values())
    if sp_mesh is not None:
        from sls_tpu.parallel.sequence import sp_scoring_fn

        fwd = sp_scoring_fn(model, sp_mesh)
    else:
        fwd = _scoring_fwd(model)  # jit re-specializes per bucket shape

    for utt_id, wav in audio_iter:
        wav = np.asarray(wav, np.float32)
        size = next((s for s in sample_sizes if wav.shape[0] <= s),
                    sample_sizes[-1])
        if wav.shape[0] <= size:
            batch = pad_or_tile(wav, size)[None, :]
        else:  # longer than the largest bucket: chunk + mean
            n_chunks = int(np.ceil(wav.shape[0] / size))
            batch = np.stack([
                pad_or_tile(wav[i * size:(i + 1) * size], size)
                for i in range(n_chunks)
            ])
        scores = np.asarray(fwd(params, jnp.asarray(batch)))
        t_bucket = [t for t, s in buckets.items() if s == size][0]
        yield utt_id, float(scores.mean()), t_bucket
