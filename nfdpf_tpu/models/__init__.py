"""Model zoo: NN building blocks, probabilistic models, and the filter engine."""

from nfdpf_tpu.models.nets import (
    LikelihoodNet,
    ObservationDecoder,
    ObservationEncoder,
    ParticleEncoder,
    TransitionMLP,
)
from nfdpf_tpu.models.measurement import build_measurement_model
from nfdpf_tpu.models.dpf import DPF, FilterOutput

__all__ = [
    "ObservationEncoder",
    "ObservationDecoder",
    "ParticleEncoder",
    "LikelihoodNet",
    "TransitionMLP",
    "build_measurement_model",
    "DPF",
    "FilterOutput",
]
