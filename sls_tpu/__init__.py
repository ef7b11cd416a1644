"""sls_tpu — TPU-native audio anti-spoofing framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
SLSforASVspoof-2021-DF reference codebase (XLS-R-300M encoder + TopK Sparse
Autoencoder heads for audio deepfake detection on ASVspoof 2019/2021 LA,
2021 DF and In-the-Wild), built TPU-first:

- Flax XLS-R encoder with bf16 matmuls and fp32 norm islands
  (reference: wav2vec/wav2vec2.py)
- Functional TopK SAE family: per-timestep, overlap-window vote,
  hard-window (reference: model.py, model_window_topk.py, model_cpc.py)
- Device-side vectorized RawBoost augmentation (reference: RawBoost.py)
- Data-parallel training over a `jax.sharding.Mesh` instead of
  nn.DataParallel (reference: main.py:518)
- ASVspoof-official EER / min t-DCF scoring (reference: eval_metric_LA.py)
"""

__version__ = "0.1.0"
