"""Metrics logging: JSON-lines always; TensorBoard when available.

Counterpart of the reference's ``SummaryWriter('./logger')`` + print logging
(`/root/reference/DPFs.py:287,347,365,402`).  The same scalar tags are
emitted for drop-in dashboard compatibility.
"""

from __future__ import annotations

import json
import os
import time

class MetricsLogger:
    """Scalar logger.

    In multi-process runs only process 0 writes (all processes see the same
    reduced scalars, so host-0-only logging is lossless); Orbax checkpoint
    saves stay collective by design — every process must participate.
    """

    def __init__(self, log_dir: str, tensorboard: bool = True):
        from nfdpf_tpu.parallel.distributed import is_primary

        self._enabled = is_primary()
        if not self._enabled:
            self._jsonl = None
            self._tb = None
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not self._enabled:
            return
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}
        ) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        if not self._enabled:
            return
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
