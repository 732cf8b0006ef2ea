"""Data: JAX-native disk-tracking simulator + npz dataset pipeline."""

from nfdpf_tpu.data.simulator import DiskSimulator, generate_dataset
from nfdpf_tpu.data.dataset import DiskDataset, iterate_batches

__all__ = ["DiskSimulator", "generate_dataset", "DiskDataset", "iterate_batches"]
