"""Pallas TPU kernels for the hot ops (large-N Sinkhorn, fused transforms)."""

from nfdpf_tpu.ops.pallas.sinkhorn_pallas import (
    ot_resample_pallas,
    streaming_lse,
    streaming_softmin,
    streaming_transport_apply,
)

__all__ = [
    "streaming_lse",
    "streaming_softmin",
    "streaming_transport_apply",
    "ot_resample_pallas",
]
