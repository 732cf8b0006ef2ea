"""Orbax checkpointing with true step resume.

Counterpart of the reference's minimal best-val-only checkpointing
(`/root/reference/utils.py:72-84`, `DPFs.py:382-390`) — but with real
resume: the reference restores weights yet restarts at epoch 0
(``start_epoch=-1`` fixed, `DPFs.py:404`); here the saved tree carries the
epoch and optimizer state and training continues where it left off.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params / batch stats / opt state / counters)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (shape/dtype template)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def checkpoint_metadata(path: str) -> Any:
    """Shape/dtype metadata tree of a saved checkpoint (no array reads) —
    lets callers build a matching restore template for checkpoints written
    by older code versions.  Leaves carry ``.shape``/``.dtype``."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.metadata(path).item_metadata.tree


def latest_checkpoint(root: str, prefix: str = "ckpt_") -> Optional[str]:
    if not os.path.isdir(root):
        return None
    cands = [d for d in os.listdir(root) if d.startswith(prefix)]
    if not cands:
        return None
    cands.sort(key=lambda d: int(d[len(prefix):]))
    return os.path.join(root, cands[-1])
