"""Weight / density primitives shared by the filter engine.

TPU-native counterparts of the reference helpers in
`/root/reference/utils.py:8-62`.  All functions are pure, shape-polymorphic in
leading batch axes, and safe under ``jit``/``vmap``/``shard_map``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normalize_log_weights(log_w: jax.Array, axis: int = -1) -> jax.Array:
    """Max-shifted softmax over the particle axis → linear probabilities.

    Mirrors `utils.py:39-44` (``normalize_log_probs``): subtract the per-row
    max, exponentiate, divide by the sum.  The max-subtraction is load-bearing
    for stability with unnormalised log-weights that can reach ±1e3.
    """
    # The reference subtracts a *differentiable* max (torch `.max()` routes
    # gradient to the argmax element), so no stop_gradient on the shift.
    shifted = log_w - jnp.max(log_w, axis=axis, keepdims=True)
    w = jnp.exp(shifted)
    return w / jnp.sum(w, axis=axis, keepdims=True)


def effective_sample_size(probs: jax.Array) -> jax.Array:
    """Mean ESS over the batch: ``mean_b 1/Σ_i w_bi²`` (`DPFs.py:163`)."""
    return jnp.mean(1.0 / jnp.sum(probs**2, axis=-1))


def log_normal_density(
    noise: jax.Array, std_pos: float, std_vel: float
) -> jax.Array:
    """Factored diagonal-Gaussian log-pdf with separate position / velocity σ.

    Mirrors `utils.py:17-37` (``compute_normal_density``) including its
    constant bookkeeping: with state dim d, the position block is
    ``noise[..., :2]`` and the velocity block ``noise[..., 2:]`` (empty when
    d == 2, in which case the velocity term degenerates to the constant
    ``-(d-2)·log σ_v = 0``).

    Args:
      noise: (..., d) noise realisations.
      std_pos / std_vel: scalars.
    Returns:
      (...,) log-density.
    """
    d = noise.shape[-1]
    log_c = -0.5 * math.log(2.0 * math.pi)
    noise_pos = noise[..., :2]
    noise_vel = noise[..., 2:]
    pos_term = -jnp.sum(noise_pos**2, axis=-1) / (2.0 * std_pos**2)
    vel_term = -jnp.sum(noise_vel**2, axis=-1) / (2.0 * std_vel**2)
    const = (
        d * log_c
        - 2.0 * math.log(std_pos)
        - (d - 2) * math.log(std_vel)
    )
    return const + pos_term + vel_term


def cosine_distance(a: jax.Array, b: jax.Array, eps: float = 1e-12) -> jax.Array:
    """``1 − cos_sim`` of L2-normalised encodings (`utils.py:8-15`)."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return 1.0 - jnp.sum(a * b, axis=-1)


def weighted_mean(particles: jax.Array, probs: jax.Array) -> jax.Array:
    """Posterior mean ``Σ_i w_i x_i`` over the particle axis.

    particles: (..., N, d); probs: (..., N) → (..., d).  `losses.py:20`.
    """
    return jnp.sum(particles * probs[..., None], axis=-2)


def uniform_log_weights(batch_size: int, num_particles: int) -> jax.Array:
    """``log(1/N)`` initial weights (`utils.py:60`)."""
    return jnp.full((batch_size, num_particles), -math.log(num_particles))
