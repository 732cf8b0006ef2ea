"""Mesh construction and sharding helpers.

The reference is single-process single-device with no distributed backend of
any kind (SURVEY.md §2.7).  Here scale-out is native: a named mesh
``('data', 'particle')`` over the TPU slice, with

  * batch trajectories sharded over ``data`` (pure data parallelism),
  * the particle axis sharded over ``particle`` ("particle parallelism", the
    tensor-parallel analog for SMC: per-step weight normalisation, ESS,
    measurement max-subtraction and particle mean/std contexts become
    cross-chip all-reduces; resampling gathers become all-gathers),
  * parameters replicated.

Collectives are inserted by GSPMD from ``with_sharding_constraint``
annotations inside the filter (`models/dpf.py`) — the scaling-book recipe:
pick a mesh, annotate shardings, let XLA place the collectives on ICI.

For multi-host pods call ``jax.distributed.initialize()`` before
``make_mesh`` (jax handles cross-host device enumeration; the mesh spans all
hosts and DCN-crossing collectives are laid out by XLA).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PARTICLE_AXIS = "particle"


def make_mesh(
    data: Optional[int] = None,
    particle: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'particle') mesh over the available devices.

    ``data=None`` uses all remaining devices after the particle axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % particle != 0:
        raise ValueError(f"{n} devices not divisible by particle={particle}")
    if data is None:
        data = n // particle
    if data * particle != n:
        raise ValueError(
            f"mesh {data}x{particle} != {n} devices; pass matching sizes"
        )
    arr = np.array(devices).reshape(data, particle)
    return Mesh(arr, (DATA_AXIS, PARTICLE_AXIS))


def constrain(x: jax.Array, mesh: Optional[Mesh], *spec) -> jax.Array:
    """``with_sharding_constraint`` if a mesh is given, else identity.

    The filter engine calls this on particles/weights inside the scan so the
    layout stays pinned across steps (otherwise GSPMD may round-trip through
    replicated layouts between resampling gathers).
    """
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a dict batch with the leading axis sharded over 'data'."""
    return jax.device_put(batch, NamedSharding(mesh, P(DATA_AXIS)))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters, optimizer state) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
