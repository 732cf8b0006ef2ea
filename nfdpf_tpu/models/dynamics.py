"""Motion model, NF dynamics, NF proposal, and the importance-weight
bookkeeping that ties them together.

TPU-native counterparts of `/root/reference/model/models.py:191-379`.  All
functions are pure: flows are passed as (module, variables) pairs and applied
functionally, so the whole step nests inside ``lax.scan``/``lax.cond``.

Stop-gradient topology preserved exactly (SURVEY.md §7 "hard parts"):
  * particle mean/std contexts are detached
    (`model/models.py:309-313,338-339,367-368`);
  * observation encodings are detached before entering the proposal
    (`model/models.py:360-361`) — gradient reaches the encoder only through
    the measurement model and AE loss.

Statistics parity: the reference uses torch ``.std(dim=1)`` which is the
UNBIASED (N−1) estimator — mirrored here via ``ddof=1``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nfdpf_tpu.ops.density import log_normal_density
from nfdpf_tpu.ops.flows import FlowChain

Array = jax.Array


def motion_update(
    key: jax.Array, particles: Array, vel: Array, pos_noise: float
) -> Tuple[Array, Array]:
    """Bootstrap-prior propagation: particles + vel + N(0, pos_noise²)
    (`model/models.py:191-204`).  vel is teacher-forced input, (B, d)."""
    b, n, d = particles.shape
    noise = pos_noise * jax.random.normal(key, (b, n, d))
    return particles + vel[:, None, :] + noise, noise


def _particle_stats(particles: Array) -> Tuple[Array, Array]:
    """Detached per-batch particle mean/std context (unbiased std)."""
    sg = jax.lax.stop_gradient
    mean = sg(jnp.mean(particles, axis=1, keepdims=True))
    std = sg(jnp.std(particles, axis=1, keepdims=True, ddof=1))
    return mean, std


def _stats_context(particles: Array, mean=None, std=None) -> Array:
    """Broadcast mean‖std to per-particle context (B, N, 2d)
    (`model/models.py:308-315`)."""
    n = particles.shape[1]
    if mean is None:
        mean, std = _particle_stats(particles)
    else:
        sg = jax.lax.stop_gradient
        mean, std = sg(mean), sg(std)
    ctx = jnp.concatenate([mean, std], axis=-1)           # (B, 1, 2d)
    return jnp.broadcast_to(ctx, (particles.shape[0], n, ctx.shape[-1]))


def nf_dynamic_model(
    dyn_flow: FlowChain,
    dyn_vars,
    particles: Array,
    use_nf: bool,
    forward: bool = False,
    mean: Optional[Array] = None,
    std: Optional[Array] = None,
    fused=None,
) -> Tuple[Array, Array]:
    """(Conditional-)flow refinement of physically propagated particles
    (`model/models.py:305-332`).

    ``forward=False`` (filter path) applies the INVERSE of the dynamics flow;
    ``forward=True`` is the consistency pass used when inverting proposals.
    ``fused`` optionally carries packed (weights, biases) to route through
    the fused Pallas coupling kernel (ops/pallas/coupling_pallas.py).
    Returns (particles', jac) with jac = −log_det, shape (B, N).
    """
    if not use_nf:
        return particles, jnp.zeros(particles.shape[:2])
    ctx = _stats_context(particles, mean, std)
    if fused is not None:
        from nfdpf_tpu.ops.pallas.coupling_pallas import fused_coupling_chain

        out, log_det = fused_coupling_chain(
            particles, ctx, fused[0], fused[1], not forward
        )
        return out, -log_det
    if forward:
        out, _, log_det = dyn_flow.apply(dyn_vars, particles, ctx,
                                         method=dyn_flow.forward)
    else:
        out, log_det = dyn_flow.apply(dyn_vars, particles, ctx,
                                      method=dyn_flow.inverse)
    return out, -log_det


def normalising_flow_propose(
    cond_flow: FlowChain,
    cond_vars,
    particles_pred: Array,
    obs_encoding: Array,
    fused=None,
) -> Tuple[Array, Array]:
    """Conditional-NF proposal (`model/models.py:334-356`).

    Context per particle = obs encoding ‖ detached particle mean ‖ std.
    Returns (proposed, jac = −log_det).
    """
    b, n, d = particles_pred.shape
    stats = _stats_context(particles_pred)                    # (B, N, 2d)
    obs = jnp.broadcast_to(obs_encoding[:, None, :],
                           (b, n, obs_encoding.shape[-1]))
    ctx = jnp.concatenate([obs, stats], axis=-1)
    if fused is not None:
        from nfdpf_tpu.ops.pallas.coupling_pallas import fused_coupling_chain

        out, log_det = fused_coupling_chain(
            particles_pred, ctx, fused[0], fused[1], True
        )
        return out, -log_det
    out, log_det = cond_flow.apply(cond_vars, particles_pred, ctx,
                                   method=cond_flow.inverse)
    return out, -log_det


def proposal_likelihood(
    cond_flow: FlowChain,
    cond_vars,
    dyn_flow: FlowChain,
    dyn_vars,
    measurement_fn: Callable[[Array, Array], Array],
    particles_dynamic: Array,
    particles_physical: Array,
    encodings: Array,
    noise: Array,
    jac_dynamic: Array,
    use_nf: bool,
    use_nf_cond: bool,
    pos_noise: float,
    vel_noise: float,
    fused_dyn=None,
    fused_cond=None,
) -> Tuple[Array, Array, Array, Array]:
    """Central importance-weight bookkeeping (`model/models.py:358-379`).

    Returns (proposed_particles, lki_log, prior_log, propose_log) so the
    filter can update ``log w += lki + prior − propose`` (`DPFs.py:187`).
    When both NF switches are off, prior == propose and the update reduces
    to the bootstrap ``log w += lki`` (`model/models.py:374-376`).
    """
    density = lambda x: log_normal_density(x, pos_noise, vel_noise)  # noqa: E731
    enc_detached = jax.lax.stop_gradient(encodings)

    if use_nf_cond:
        propose, jac_prop = normalising_flow_propose(
            cond_flow, cond_vars, particles_dynamic, enc_detached,
            fused=fused_cond,
        )
        if use_nf:
            phys_mean = jnp.mean(particles_physical, axis=1, keepdims=True)
            phys_std = jnp.std(particles_physical, axis=1, keepdims=True, ddof=1)
            prop_dyn_inv, jac_prop_dyn_inv = nf_dynamic_model(
                dyn_flow, dyn_vars, propose, use_nf=True, forward=True,
                mean=phys_mean, std=phys_std, fused=fused_dyn,
            )
            prior_log = (
                density(prop_dyn_inv - (particles_physical - noise))
                - jac_prop_dyn_inv
            )
        else:
            prior_log = density(propose - (particles_physical - noise))
        propose_log = density(noise) + jac_dynamic + jac_prop
    else:
        propose = particles_dynamic
        prior_log = density(noise) + jac_dynamic
        propose_log = density(noise) + jac_dynamic

    lki_log = measurement_fn(encodings, propose)
    return propose, lki_log, prior_log, propose_log
