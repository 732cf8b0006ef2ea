"""Utilities: checkpointing, metrics/logging, RNG helpers."""

from nfdpf_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from nfdpf_tpu.utils.metrics import MetricsLogger

__all__ = ["save_checkpoint", "restore_checkpoint", "MetricsLogger"]
