"""int8 serving-path quantization (TPU MXU int8 = ~1.6x bf16 peak)."""

from sls_tpu.quant.int8 import QuantizableDense, int8_dot  # noqa: F401
