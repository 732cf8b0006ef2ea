"""Pure-math ops: densities, flows, resamplers, Pallas kernels."""

from nfdpf_tpu.ops.density import (
    cosine_distance,
    effective_sample_size,
    log_normal_density,
    normalize_log_weights,
    weighted_mean,
)
from nfdpf_tpu.ops.resampling import soft_systematic_resample, systematic_indices
from nfdpf_tpu.ops.sinkhorn import ot_resample, sinkhorn_transport

__all__ = [
    "cosine_distance",
    "effective_sample_size",
    "log_normal_density",
    "normalize_log_weights",
    "weighted_mean",
    "soft_systematic_resample",
    "systematic_indices",
    "ot_resample",
    "sinkhorn_transport",
]
