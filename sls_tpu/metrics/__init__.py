from sls_tpu.metrics.eer import (
    asv_error_rates,
    compute_det_curve,
    compute_eer,
    compute_tdcf,
    compute_tdcf_legacy,
    roc_eer,
)

__all__ = [
    "asv_error_rates",
    "compute_det_curve",
    "compute_eer",
    "compute_tdcf",
    "compute_tdcf_legacy",
    "roc_eer",
]
