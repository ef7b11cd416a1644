"""Train / eval CLI, mirroring the reference's argparse surface.

Flag-compatible re-design of the reference entry point
(reference: main.py:402-461): dataset paths, track selection, hyper-
parameters, SAE configuration, RawBoost's 17 parameters, checkpoint /
resume control, and eval-mode score production.

Differences (documented):
- ``--cp_path`` takes a fairseq wav2vec2 checkpoint (.pt) OR a converted
  .npz; weights are converted on load (encoder/convert.py)
- run state lives in <model_dir>/<model_tag>/ with last.ckpt/best.ckpt
  instead of *.pth files
- augmentation runs on-device; the RawBoost flags feed RawBoostConfig
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="sls_tpu anti-spoofing train/eval")
    # datasets (reference: main.py:404-418)
    p.add_argument("--database_path", type=str, default="./data/",
                   help="root with ASVspoof2019/2021 audio dirs")
    p.add_argument("--protocols_path", type=str, default="./database/",
                   help="root with CM protocol files")
    p.add_argument("--track", type=str, default="LA",
                   choices=["LA", "DF", "In-the-Wild", "2019LA"])
    p.add_argument("--model_type", type=str, default="sae",
                   choices=["sae", "sls"],
                   help="sae = TopK-SAE detector; sls = upstream XLS-R+SLS "
                        "parity model")
    p.add_argument("--audio_ext", type=str, default="flac")
    # hyperparameters (reference: main.py:419-424)
    p.add_argument("--batch_size", type=int, default=14)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    # encoder
    p.add_argument("--cp_path", type=str, default=None,
                   help="pretrained XLS-R checkpoint (fairseq .pt, HF "
                   "export, or .npz); when omitted, ./xlsr2_300m.pt is "
                   "auto-used if present (reference default name). An "
                   "explicitly given path that doesn't exist is an error")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no_bf16", dest="bf16", action="store_false")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer layers (memory for FLOPs)")
    p.add_argument("--pallas_sae", action="store_true",
                   help="fused Pallas SAE encode+topk kernel (TPU)")
    p.add_argument("--int8", action="store_true",
                   help="int8 dynamic-quantized serving (eval paths only; "
                   "same checkpoints; training/golden-parity stay "
                   "bf16/fp32).  Default scope quantizes the FFN GEMMs "
                   "only — measured 1.14x eval throughput on the flagship")
    p.add_argument("--int8_scope", choices=["ffn", "all"], default="ffn",
                   help="which matmuls go int8: 'ffn' (fc1/fc2; measured "
                   "1.14x) or 'all' (+QKVO; measured 0.94x — for wider "
                   "layer configs only)")
    wire = p.add_mutually_exclusive_group()
    wire.add_argument("--wire_int16", action="store_true",
                      help="upload waveforms as int16 (half the "
                      "host->device bytes; device dequantizes in-step — "
                      "lossless for 16-bit sources like all ASVspoof FLAC)")
    wire.add_argument("--wire_mulaw", action="store_true",
                      help="upload waveforms as 8-bit mu-law (quarter the "
                      "float32 bytes; LOSSY ~35-38 dB speech SNR — opt-in "
                      "for wire-bandwidth-bound serving, accuracy gate in "
                      "tests/test_mulaw.py)")
    # SAE (reference: main.py:430-441)
    p.add_argument("--use_sae", action="store_true", default=True)
    p.add_argument("--no_sae", dest="use_sae", action="store_false")
    p.add_argument("--use_sparse_features", action="store_true", default=True)
    p.add_argument("--use_reconstructed_features", dest="use_sparse_features",
                   action="store_false")
    p.add_argument("--sae_dict_size", type=int, default=4096)
    p.add_argument("--sae_k", type=int, default=128)
    p.add_argument("--sae_weight", type=float, default=0.1)
    p.add_argument("--use_window_topk", action="store_true")
    p.add_argument("--overlap_windows", action="store_true",
                   help="50%%-overlap vote windows (else hard windows)")
    p.add_argument("--sae_window_size", type=int, default=8)
    # CPC (reference: train_cpc.py:442-452)
    p.add_argument("--use_cpc", action="store_true")
    p.add_argument("--cpc_weight", type=float, default=0.5)
    p.add_argument("--cpc_hidden_dim", type=int, default=256)
    p.add_argument("--cpc_prediction_steps", type=int, nargs="+",
                   default=[1, 2, 4])
    # runtime (reference: main.py:425-429)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--comment", type=str, default=None)
    p.add_argument("--quick_test", action="store_true",
                   help="truncate loops to 5 batches")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of N early steps")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel degree over a ('data','model') "
                   "mesh: shards the FFN/SAE wide dims (parallel/tensor.py)")
    # checkpointing (reference: main.py:420-423,462-464)
    p.add_argument("--model_dir", type=str, default="models")
    p.add_argument("--model_path", type=str, default=None,
                   help="explicit checkpoint to load")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--fresh_start", action="store_true")
    # eval (reference: main.py:426-428)
    p.add_argument("--is_eval", action="store_true")
    p.add_argument("--eval_output", type=str, default=None)
    p.add_argument("--full_utterance", action="store_true",
                   help="score variable-length audio with overlapping "
                        "windows instead of the fixed 64,600-sample crop")
    p.add_argument("--unwindowed", action="store_true",
                   help="with --full_utterance: one forward per clip "
                        "with the WHOLE waveform in attention context "
                        "(length-bucketed; long clips use the VMEM "
                        "attention kernel)")
    p.add_argument("--seq_parallel", type=int, default=1,
                   help="with --full_utterance --unwindowed: shard each "
                        "clip's frame axis over this many devices "
                        "(sequence parallelism, parallel/sequence.py); "
                        "1 = off")
    # RawBoost (reference: main.py:443-459)
    p.add_argument("--algo", type=int, default=3)
    p.add_argument("--nBands", type=int, default=5)
    p.add_argument("--minF", type=int, default=20)
    p.add_argument("--maxF", type=int, default=8000)
    p.add_argument("--minBW", type=int, default=100)
    p.add_argument("--maxBW", type=int, default=1000)
    p.add_argument("--minCoeff", type=int, default=10)
    p.add_argument("--maxCoeff", type=int, default=100)
    p.add_argument("--minG", type=int, default=0)
    p.add_argument("--maxG", type=int, default=0)
    p.add_argument("--minBiasLinNonLin", type=int, default=5)
    p.add_argument("--maxBiasLinNonLin", type=int, default=20)
    p.add_argument("--N_f", type=int, default=5)
    p.add_argument("--P", type=int, default=10)
    p.add_argument("--g_sd", type=int, default=2)
    p.add_argument("--SNRmin", type=int, default=10)
    p.add_argument("--SNRmax", type=int, default=40)
    # testing escape hatch: tiny encoder + short crops (CI-scale e2e)
    p.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    return p


def config_from_args(args) -> "ExperimentConfig":
    import jax.numpy as jnp

    from sls_tpu.config import (
        CPCConfig,
        ExperimentConfig,
        ModelConfig,
        RawBoostConfig,
        SAEConfig,
        TrainConfig,
        XLSRConfig,
    )

    if args.use_window_topk:
        variant = "window_overlap" if args.overlap_windows else "window_hard"
    elif args.use_cpc:
        variant = "window_hard"  # CPC model uses hard windows (model_cpc.py)
    else:
        variant = "per_timestep"

    # int8 is a SERVING config: honor --int8 only under --is_eval.  In a
    # training run the flag would otherwise flip every deterministic
    # forward — including mid-training validation — to quantized
    # numerics, so val EER and best-checkpoint selection would silently
    # ride a ~0.01 score deviation the flag is documented not to touch.
    int8 = getattr(args, "int8", False) and getattr(args, "is_eval", False)
    if getattr(args, "int8", False) and not int8:
        print("NOTE: --int8 is serving-only; ignored for this training "
              "run (validation stays exact-precision). Pass it with "
              "--is_eval to serve quantized.")
    if getattr(args, "tiny", False):
        from sls_tpu.config import tiny_xlsr_config

        encoder = tiny_xlsr_config(
            int8_serving=int8,
            int8_scope=getattr(args, "int8_scope", "ffn"),
        )
        act_dim = encoder.embed_dim
    else:
        encoder = XLSRConfig(dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                             remat=args.remat,
                             int8_serving=int8,
                             int8_scope=getattr(args, "int8_scope", "ffn"))
        act_dim = 1024

    use_sae = args.use_sae and getattr(args, "model_type", "sae") != "sls"
    model = ModelConfig(
        encoder=encoder,
        use_sae=use_sae,
        use_sparse_features=args.use_sparse_features,
        sae=SAEConfig(
            activation_dim=act_dim,
            dict_size=args.sae_dict_size,
            k=args.sae_k,
            variant=variant,
            window_size=args.sae_window_size,
            use_pallas=args.pallas_sae,
        ),
        use_cpc=args.use_cpc,
        cpc=CPCConfig(
            hidden_dim=args.cpc_hidden_dim,
            prediction_steps=tuple(args.cpc_prediction_steps),
        ),
    )
    rawboost = RawBoostConfig(
        algo=args.algo, nBands=args.nBands, minF=args.minF, maxF=args.maxF,
        minBW=args.minBW, maxBW=args.maxBW, minCoeff=args.minCoeff,
        maxCoeff=args.maxCoeff, minG=args.minG, maxG=args.maxG,
        minBiasLinNonLin=args.minBiasLinNonLin,
        maxBiasLinNonLin=args.maxBiasLinNonLin, N_f=args.N_f, P=args.P,
        g_sd=args.g_sd, SNRmin=args.SNRmin, SNRmax=args.SNRmax,
    )
    train = TrainConfig(
        batch_size=args.batch_size, num_epochs=args.num_epochs, lr=args.lr,
        weight_decay=args.weight_decay, sae_weight=args.sae_weight,
        cpc_weight=args.cpc_weight, seed=args.seed, rawboost=rawboost,
        cut_length=1000 if getattr(args, "tiny", False) else 64600,
        model_parallel=getattr(args, "model_parallel", 1),
    )
    return ExperimentConfig(model=model, train=train, track=args.track,
                            comment=args.comment)


def load_pretrained_encoder(cp_path: str, encoder_cfg):
    """Load + convert a pretrained XLS-R checkpoint to encoder params.

    Handles fairseq dict checkpoints ({'model': state}), bare state dicts,
    HuggingFace Wav2Vec2Model state dicts (detected by the
    'feature_projection' naming), and pre-converted .npz archives."""
    from sls_tpu.encoder.convert import (
        fairseq_encoder_to_flax,
        hf_encoder_to_flax,
        strip_prefixes,
    )

    path = Path(cp_path)
    if path.suffix == ".npz":
        state = dict(np.load(path, allow_pickle=False))
    else:
        import torch

        import pickle

        try:
            raw = torch.load(path, map_location="cpu", weights_only=True)
        except pickle.UnpicklingError:
            # real fairseq checkpoints (xlsr2_300m.pt) embed a cfg payload
            # of argparse.Namespace / omegaconf objects that the
            # weights_only unpickler REFUSES (reference loads them through
            # fairseq.checkpoint_utils, model.py:109-126).  Only that
            # refusal triggers the full-pickle fallback: a truncated or
            # corrupted file keeps its original error, and a file that
            # fails for any other reason is never fed to the unrestricted
            # unpickler.
            raw = torch.load(path, map_location="cpu", weights_only=False)
        state = raw.get("model", raw) if isinstance(raw, dict) else raw
        state = {
            k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")
        }
    state = strip_prefixes(
        state, ("module.", "w2v_encoder.", "w2v_model.", "wav2vec2.")
    )
    if any("feature_projection." in k for k in state):
        return hf_encoder_to_flax(state, encoder_cfg)
    return fairseq_encoder_to_flax(state, encoder_cfg)


def _protocol_paths(args):
    """Resolve the per-track protocol files (reference: main.py:661-676)."""
    proto = Path(args.protocols_path)
    return {
        "train": proto / "ASVspoof2019.LA.cm.train.trn.txt",
        "dev": proto / "ASVspoof2019.LA.cm.dev.trl.txt",
        "eval_2019": proto / "ASVspoof2019.LA.cm.eval.trl.txt",
        "eval_LA": proto / "ASVspoof2021.LA.cm.eval.trl.txt",
        "eval_DF": proto / "ASVspoof2021.DF.cm.eval.trl.txt",
        "eval_wild": proto / "in_the_wild.eval.txt",
    }


def run_eval(args, cfg, trainer):
    from sls_tpu.data.pipeline import BatchLoader, DatasetIndex
    from sls_tpu.data.protocols import parse_eval_list

    paths = _protocol_paths(args)
    db = Path(args.database_path)
    if args.track == "2019LA":
        # 2019 LA eval protocol is 5-column with labels; ids are column 2
        # (reference: generate_scores_2019_eval.py)
        from sls_tpu.data.protocols import parse_train_protocol

        _, ids = parse_train_protocol(paths["eval_2019"])
        index = DatasetIndex.for_eval(ids, db / "ASVspoof2019_LA_eval",
                                      ext=args.audio_ext)
        default_out = "scores/scores_2019LA.txt"
    elif args.track == "LA":
        ids = parse_eval_list(paths["eval_LA"])
        index = DatasetIndex.for_eval(ids, db / "ASVspoof2021_LA_eval",
                                      ext=args.audio_ext)
        default_out = "scores/scores_LA.txt"
    elif args.track == "DF":
        ids = parse_eval_list(paths["eval_DF"])
        index = DatasetIndex.for_eval(ids, db / "ASVspoof2021_DF_eval",
                                      ext=args.audio_ext)
        default_out = "scores/scores_DF.txt"
    else:
        ids = parse_eval_list(paths["eval_wild"])
        index = DatasetIndex.for_in_the_wild(ids, db / "release_in_the_wild")
        default_out = "scores/scores_Wild.txt"

    import jax

    if jax.process_count() > 1:
        # each host scores its own shard on its local mesh; part files
        # are merged by the primary in BaseTrainer.produce_scores
        index = index.host_shard(jax.process_index(), jax.process_count())

    out = args.eval_output or default_out
    if args.full_utterance:
        from sls_tpu.data.audio import load_audio
        from sls_tpu.evaluation.overlap import (
            score_utterances_streamed,
            score_utterances_unwindowed,
        )
        from sls_tpu.parallel import distributed as dist
        from sls_tpu.scores.writer import ScoreWriter

        def audio_iter():
            cap = 5 * args.batch_size if args.quick_test else None
            for i, (utt, path) in enumerate(zip(index.utt_ids, index.paths)):
                if cap is not None and i >= cap:
                    return
                wav = load_audio(path)
                yield utt, wav if wav.size else np.zeros(
                    cfg.train.cut_length, np.float32
                )

        # multi-host: local-mesh params (hosts stream different
        # utterance counts, so no global-mesh lockstep programs) and a
        # per-host part file merged by the primary
        (params,) = trainer._to_eval_mesh((trainer.state.params,))
        if args.unwindowed:
            # whole clip in ONE forward (global attention context);
            # long-T buckets route through the VMEM attention kernel,
            # or across chips when --seq_parallel > 1
            score_model, mesh_sp = trainer.model, None
            if args.seq_parallel > 1:
                from sls_tpu.models.detector import Detector
                from sls_tpu.parallel.sequence import (
                    sp_mesh as make_sp_mesh,
                    sp_model_config,
                )

                # local devices only: multi-host eval deliberately runs
                # per-host programs on per-host shards (see the
                # host_shard comment above) — a global-device SP mesh
                # would deadlock hosts streaming different clip counts
                score_model = Detector(sp_model_config(cfg.model))
                mesh_sp = make_sp_mesh(
                    args.seq_parallel, devices=jax.local_devices()
                )
            results = (
                (utt, score)
                for utt, score, _ in score_utterances_unwindowed(
                    score_model, params, audio_iter(),
                    cfg.model.encoder, sp_mesh=mesh_sp,
                )
            )
        else:
            results = score_utterances_streamed(
                trainer.model, params, audio_iter(),
                window=cfg.train.cut_length,
                batch_size=args.batch_size,
            )
        n = 0
        with ScoreWriter(dist.part_path(out)) as writer:
            for utt, score in results:
                writer.write_batch([utt], [score])
                n += 1
        dist.merge_part_files(out)
        n = int(dist.allreduce_sum_scalars([float(n)])[0])
    else:
        loader = BatchLoader(
            index, batch_size=args.batch_size, shuffle=False,
            cut=cfg.train.cut_length,
            limit_batches=5 if args.quick_test else None,
            wire_dtype=_wire_dtype(args),
        )
        n = trainer.produce_scores(loader, out)
    print(f"wrote {n} scores to {out}")


def run_train(args, cfg, trainer):
    from sls_tpu.data.pipeline import BatchLoader, DatasetIndex
    from sls_tpu.data.protocols import parse_train_protocol

    paths = _protocol_paths(args)
    db = Path(args.database_path)
    labels_tr, ids_tr = parse_train_protocol(paths["train"])
    labels_dev, ids_dev = parse_train_protocol(paths["dev"])
    train_index = DatasetIndex.for_train(
        ids_tr, labels_tr, db / "ASVspoof2019_LA_train", ext=args.audio_ext
    )
    dev_index = DatasetIndex.for_train(
        ids_dev, labels_dev, db / "ASVspoof2019_LA_dev", ext=args.audio_ext
    )
    import jax

    if jax.process_count() > 1:
        # multi-host: each host reads its own slice; equal-length train
        # shards keep the global-mesh train steps in lockstep, dev
        # shards cover-all since validation runs on the local mesh
        train_index = train_index.host_shard(
            jax.process_index(), jax.process_count(), drop_remainder=True
        )
        dev_index = dev_index.host_shard(
            jax.process_index(), jax.process_count()
        )
    limit = 5 if args.quick_test else None
    wire = _wire_dtype(args)
    train_loader = BatchLoader(train_index, args.batch_size, shuffle=True,
                               cut=cfg.train.cut_length, seed=args.seed,
                               limit_batches=limit, wire_dtype=wire)
    dev_loader = BatchLoader(dev_index, args.batch_size,
                             cut=cfg.train.cut_length, limit_batches=limit,
                             wire_dtype=wire)
    trainer.fit(train_loader, dev_loader)


def _wire_dtype(args) -> str:
    if getattr(args, "wire_mulaw", False):
        return "mulaw"
    return "int16" if args.wire_int16 else "float32"


def _apply_platform_env():
    """Honor SLS_TPU_PLATFORM (e.g. 'cpu') before backend init.

    The jax.config route is required: this environment's TPU plugin
    injects a sitecustomize hook that overrides JAX_PLATFORMS at
    process start, so the standard env var cannot force the CPU
    backend (same technique as tests/conftest.py).  Lets test/CI
    runs that spawn this CLI as a subprocess (cli/sweep.py ->
    cli/autotrain.py -> here) stay hermetic instead of depending on
    accelerator availability; SLS_TPU_CPU_DEVICES additionally sizes
    a virtual device mesh.
    """
    import os

    plat = os.environ.get("SLS_TPU_PLATFORM")
    if not plat:
        return
    import jax

    if jax._src.xla_bridge._backends:  # already initialized: too late
        return
    jax.config.update("jax_platforms", plat)
    n = os.environ.get("SLS_TPU_CPU_DEVICES")
    if n and plat == "cpu":
        jax.config.update("jax_num_cpu_devices", int(n))


def main(argv=None) -> int:
    _apply_platform_env()
    args = build_parser().parse_args(argv)
    if args.resume and args.fresh_start:
        print("ERROR: --resume and --fresh_start are mutually exclusive")
        return 2
    if args.unwindowed and not (args.is_eval and args.full_utterance):
        # same fail-loud policy as --seq_parallel below: silently
        # falling back to the fixed 64,600-sample crop would score a
        # different model behavior than the user asked for
        print("ERROR: --unwindowed requires --is_eval --full_utterance "
              "(it scores whole clips in one forward)")
        return 2
    if args.seq_parallel > 1 and not (
        args.is_eval and args.full_utterance and args.unwindowed
    ):
        # fail loud: silently scoring windowed/single-device while the
        # user believes they ran sequence-parallel would be worse
        print("ERROR: --seq_parallel requires --is_eval "
              "--full_utterance --unwindowed (it shards the frame axis "
              "of whole-clip forwards)")
        return 2

    # multi-host wiring: no-op single-process; on pods/SLURM (or with
    # SLS_TPU_COORDINATOR set) connects the JAX distributed runtime
    # BEFORE any backend use (parallel/distributed.py)
    from sls_tpu.parallel import distributed as dist

    dist.initialize()

    cfg = config_from_args(args)
    run_dir = Path(args.model_dir) / cfg.model_tag()
    print(f"run dir: {run_dir}")

    if args.model_type == "sls":
        from sls_tpu.models.sls import SLSTrainer as TrainerCls
    else:
        from sls_tpu.train.loop import Trainer as TrainerCls

    trainer = TrainerCls(cfg, run_dir, profile_steps=args.profile_steps)
    trainer.init_state(np.zeros((2, cfg.train.cut_length), np.float32))

    # pretrained encoder weights: an explicit --cp_path that doesn't
    # exist is a hard error (a typo must not silently launch a multi-day
    # run on a random 300M encoder); with no flag, the reference's
    # default checkpoint name is auto-used when present
    cp_path = args.cp_path
    if cp_path and not Path(cp_path).exists():
        print(f"ERROR: --cp_path checkpoint not found: {cp_path}")
        return 2
    if not cp_path and Path("xlsr2_300m.pt").exists():
        cp_path = "xlsr2_300m.pt"
    if cp_path:
        enc_params = load_pretrained_encoder(cp_path, cfg.model.encoder)
        params = dict(trainer.state.params)
        params["encoder"] = enc_params
        from sls_tpu.parallel.mesh import replicate

        trainer.state = trainer.state.replace(
            params=replicate(params, trainer.mesh)
        )
        print(f"loaded pretrained encoder from {cp_path}")
    elif not args.is_eval:
        print("WARNING: no pretrained encoder (--cp_path): training from "
              "a RANDOMLY INITIALIZED XLS-R encoder")

    # resume only when asked (--resume / --model_path), or for eval runs
    # which need trained weights; an old checkpoint in the run dir must
    # not silently hijack a fresh training launch
    want_resume = bool(args.resume or args.model_path or args.is_eval)
    resumed = (
        trainer.resume(args.model_path, fresh_start=args.fresh_start)
        if want_resume
        else False
    )
    if resumed:
        print(f"resumed at epoch {trainer.start_epoch}")

    if args.is_eval:
        run_eval(args, cfg, trainer)
    else:
        run_train(args, cfg, trainer)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
