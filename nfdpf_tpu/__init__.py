"""TPU-native Normalizing-Flow Differentiable Particle Filters.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the PyTorch
reference `xiongjiechen/Normalizing-Flows-DPFs` (NF-DPF, IEEE TSP 2024;
CNF-DPF, FUSION 2021; DPF-CM, EUSIPCO 2022): differentiable particle filters
whose dynamic model, proposal distribution and measurement density are built
from (conditional) normalizing flows, with differentiable resampling (soft /
entropy-regularised optimal transport), trained end-to-end on the
disk-tracking vision benchmark.

Layout
------
- ``nfdpf_tpu.ops``      pure-math library: flows, resamplers, densities, Pallas kernels
- ``nfdpf_tpu.models``   model zoo (encoders, measurement models, dynamics, CGLOW, filter engine)
- ``nfdpf_tpu.parallel`` device-mesh / sharding layer
- ``nfdpf_tpu.utils``    RNG, checkpointing, metrics
- ``nfdpf_tpu.data``     JAX-native disk simulator + npz dataset pipeline
"""

from nfdpf_tpu.config import DPFConfig, parse_args

__version__ = "0.1.0"

__all__ = ["DPFConfig", "parse_args", "__version__"]
