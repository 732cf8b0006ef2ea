"""Soft / systematic differentiable resampling.

TPU-native counterpart of `/root/reference/resamplers/resamplers.py:20-60`
(``soft_resampler``).  The reference builds an O(N²) marker-vs-cumsum
comparison matrix (`resamplers.py:49-51`); we use a vmapped
``searchsorted`` — O(N log N) and gather-friendly, which matters at the
10k-particle scale this framework targets.

Semantics preserved exactly:
  * sampling distribution q = α·w + (1−α)/N, importance correction w ← w/q
    (`resamplers.py:29-38`);
  * stratified markers: shared per-row uniform offset + linspace
    (`resamplers.py:42-48`);
  * stability clamp ``cum_probs[:, -1] = 1.0`` (`resamplers.py:47`);
  * the chosen index = #{j : cum_probs[j] < marker} (strict), identical to
    the reference's ``(markers > cum_probs).sum()``;
  * returned probs renormalised over the resampled set (`resamplers.py:56`);
  * ancestor indices returned for pseudo-likelihood tracking.  We return
    per-batch indices in [0, N) rather than the reference's flattened
    ``i·N + j`` indices (`resamplers.py:52`) — the losses gather with
    ``take_along_axis`` accordingly.

Gradient topology: indices are integer (non-differentiable); gradients flow
through the gathered particle VALUES and the importance-corrected weights,
exactly as in the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def systematic_indices(key: jax.Array, q_probs: Array) -> Array:
    """Stratified/systematic ancestor indices for each batch row.

    q_probs: (B, N) sampling distribution (rows sum to 1).
    Returns int32 (B, N) indices.
    """
    batch, n = q_probs.shape
    basic = jnp.linspace(0.0, (n - 1.0) / n, n)
    offset = jax.random.uniform(key, (batch, 1), minval=0.0, maxval=1.0 / n)
    markers = offset + basic[None, :]                       # (B, N)
    cum = jnp.cumsum(q_probs, axis=1)
    cum = cum.at[:, -1].set(1.0)                            # resamplers.py:47
    # index = #{j : cum[j] < marker} == searchsorted(cum, marker, side='left')
    idx = jax.vmap(lambda c, m: jnp.searchsorted(c, m, side="left"))(cum, markers)
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def soft_systematic_resample(
    key: jax.Array,
    particles: Array,
    probs: Array,
    alpha: float,
) -> Tuple[Array, Array, Array]:
    """Soft resampling (Karkus et al.) with systematic sampling.

    Args:
      particles: (B, N, d); probs: (B, N) linear weights; alpha in (0, 1].
    Returns:
      (particles', probs', ancestor_idx) with probs' linear & renormalised.
    """
    assert 0.0 < alpha <= 1.0
    batch, n = probs.shape
    uniform = jnp.full_like(probs, 1.0 / n)
    if alpha < 1.0:
        q = alpha * probs + (1.0 - alpha) * uniform
        q = q / jnp.sum(q, axis=-1, keepdims=True)
        corrected = probs / q
    else:
        q = probs
        corrected = uniform
    idx = systematic_indices(key, q)
    new_particles = jnp.take_along_axis(particles, idx[..., None], axis=1)
    new_probs = jnp.take_along_axis(corrected, idx, axis=1)
    new_probs = new_probs / jnp.sum(new_probs, axis=-1, keepdims=True)
    return new_particles, new_probs, idx


def multinomial_resample(
    key: jax.Array, particles: Array, probs: Array
) -> Tuple[Array, Array, Array]:
    """Plain multinomial resampling (baseline; not in the reference)."""
    batch, n = probs.shape
    keys = jax.random.split(key, batch)
    idx = jax.vmap(
        lambda k, p: jax.random.choice(k, n, shape=(n,), p=p)
    )(keys, probs).astype(jnp.int32)
    new_particles = jnp.take_along_axis(particles, idx[..., None], axis=1)
    new_probs = jnp.full_like(probs, 1.0 / n)
    return new_particles, new_probs, idx
