"""Entropy-regularised optimal-transport resampling (ε-annealed Sinkhorn).

TPU-native counterpart of `/root/reference/resamplers/resamplers.py:62-277`.
The Python ``while`` loop becomes ``jax.lax.while_loop`` over a fixed state
tuple; per-batch convergence freezing, ε-annealing, and the symmetric
potential averaging are preserved exactly.

Gradient topology (the subtle part, mirrored deliberately — SURVEY.md §2.5):
the reference computes the whole Sinkhorn loop on detached clones and its
custom ``transport`` autograd Function returns all-None grads
(`resamplers.py:234-245`), so the ONLY gradient path through OT resampling is
through the particle operand of ``matmul(T, particles)``
(`resamplers.py:256`).  With ``transport_grad=False`` (default) we reproduce
that: ``T = stop_gradient(T)``.  With ``transport_grad=True`` the final
differentiable Sinkhorn round (`resamplers.py:172-178`) stays on the tape and
gradients also flow through T into particles and log-weights — the "true"
OT-DPF estimator of Corenflos et al. 2021.

Annealing schedule parity (`resamplers.py:113-179`):
  ε₀ = diameter², ε_{t+1} = max(ε_t·scaling², ε_target); loop continues while
  iter < max_iter−1 AND **all** batch rows still flagged running (the
  reference's ``torch.all`` continue-condition, `resamplers.py:126-129` —
  configurable here via ``convergence='all'|'any'``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def squared_distances(x: Array, y: Array) -> Array:
    """Pairwise ||x_i − y_j||² over the particle axis (`resamplers.py:83-84`)."""
    x2 = jnp.sum(x**2, axis=-1)
    y2 = jnp.sum(y**2, axis=-1)
    xy = jnp.einsum("bnd,bmd->bnm", x, y)
    return jnp.maximum(x2[..., :, None] + y2[..., None, :] - 2.0 * xy, 0.0)


def cost(x: Array, y: Array) -> Array:
    """½·squared distance (`resamplers.py:79-80`)."""
    return squared_distances(x, y) / 2.0


def diameter(x: Array, y: Array) -> Array:
    """max over dims of per-batch std, floored at 1 (`resamplers.py:72-76`).

    The reference uses biased std (unbiased=False) here.
    """
    dx = jnp.max(jnp.std(x, axis=1), axis=-1)
    dy = jnp.max(jnp.std(y, axis=1), axis=-1)
    res = jnp.maximum(dx, dy)
    return jnp.where(res == 0.0, 1.0, res)


def max_min(x: Array, y: Array) -> Array:
    """Scale proxy used as the annealing diameter (`resamplers.py:87-91`).

    NOTE the reference computes ``min_min`` from ``x.max(dim=1).min()`` (a
    max-then-min, not min-then-min) — we mirror that exactly.
    """
    max_max = jnp.maximum(jnp.max(x, axis=(1, 2)), jnp.max(y, axis=(1, 2)))
    min_min = jnp.minimum(
        jnp.min(jnp.max(x, axis=1), axis=-1), jnp.min(y, axis=(1, 2))
    )
    return max_max - min_min


def softmin(epsilon: Array, cost_matrix: Array, f: Array) -> Array:
    """−ε·logsumexp(f − C/ε) over the last axis (`resamplers.py:94-110`).

    epsilon: (B,) or scalar; cost_matrix: (B, N, M); f: (B, M) → (B, N).
    """
    eps = jnp.broadcast_to(jnp.asarray(epsilon), (cost_matrix.shape[0],))
    val = f[:, None, :] - cost_matrix / eps[:, None, None]
    lse = jax.nn.logsumexp(val, axis=2)
    return -eps[:, None] * lse


class _LoopState(NamedTuple):
    i: Array
    a_y: Array
    b_x: Array
    running: Array          # (B,) bool
    eps: Array              # (B,) running epsilon


def sinkhorn_loop(
    log_alpha: Array,
    log_beta: Array,
    cost_xy: Array,
    cost_yx: Array,
    epsilon: float,
    particles_diameter: Array,
    scaling: float,
    threshold: float,
    max_iter: int,
    convergence: str = "all",
) -> Tuple[Array, Array, Array]:
    """ε-annealed symmetric Sinkhorn (`resamplers.py:113-179`).

    Runs entirely under ``stop_gradient`` (the caller detaches inputs), then
    performs ONE differentiable softmin round at the target ε.
    Returns (a_y, b_x, total_iter).

    The reference's loop also maintains the self-transport potentials
    (a_x, b_y) — but they never influence (a_y, b_x), the convergence test,
    or the transport assembly (`resamplers.py:190-191` discards them:
    ``alpha, beta, _, _, _``); they are a Sinkhorn-divergence debiasing
    vestige.  Dropping them halves the loop's softmin count with
    bit-identical (a_y, b_x) trajectories, and removes the (B, N, N)
    ``cost_xx``/``cost_yy`` matrices entirely.
    """
    eps_target = jnp.asarray(epsilon, cost_xy.dtype)
    batch = log_alpha.shape[0]
    eps0 = particles_diameter**2
    scaling_factor = scaling**2

    a_y = softmin(eps0, cost_yx, log_alpha)
    b_x = softmin(eps0, cost_xy, log_beta)

    def cond_fn(s: _LoopState):
        it_ok = s.i < max_iter - 1
        if convergence == "all":
            # reference: continue while ALL rows are still running
            return jnp.logical_and(it_ok, jnp.all(s.running))
        return jnp.logical_and(it_ok, jnp.any(s.running))

    def body_fn(s: _LoopState):
        eps_ = s.eps[:, None]
        run = s.running[:, None]
        at_y = jnp.where(run, softmin(s.eps, cost_yx, log_alpha + s.b_x / eps_), s.a_y)
        bt_x = jnp.where(run, softmin(s.eps, cost_xy, log_beta + s.a_y / eps_), s.b_x)
        a_y_new = (s.a_y + at_y) / 2
        b_x_new = (s.b_x + bt_x) / 2
        a_y_diff = jnp.max(jnp.abs(a_y_new - s.a_y), axis=1)
        b_x_diff = jnp.max(jnp.abs(b_x_new - s.b_x), axis=1)
        local_continue = jnp.logical_or(a_y_diff > threshold, b_x_diff > threshold)
        new_eps = jnp.maximum(s.eps * scaling_factor, eps_target)
        global_continue = jnp.logical_or(new_eps < s.eps, local_continue)
        return _LoopState(s.i + 1, a_y_new, b_x_new,
                          global_continue, new_eps)

    init = _LoopState(
        jnp.asarray(0), a_y, b_x,
        jnp.ones((batch,), bool), jnp.broadcast_to(eps0, (batch,))
    )
    # the annealing loop itself is never differentiated (caller stop-grads
    # its inputs, matching `resamplers.py:270`); while_loop is fine.
    final = jax.lax.while_loop(cond_fn, body_fn, init)

    # one differentiable round at target ε with detached potentials
    # (`resamplers.py:172-178`).
    ca_y = jax.lax.stop_gradient(final.a_y)
    cb_x = jax.lax.stop_gradient(final.b_x)
    eps_b = jnp.broadcast_to(eps_target, (batch,))
    eps_col = eps_b[:, None]
    final_a_y = softmin(eps_b, cost_yx, log_alpha + cb_x / eps_col)
    final_b_x = softmin(eps_b, cost_xy, log_beta + ca_y / eps_col)
    return final_a_y, final_b_x, final.i + 2


def sinkhorn_potentials(
    log_alpha: Array, x: Array, log_beta: Array, y: Array,
    epsilon: float, scaling: float, threshold: float, max_iter: int,
    convergence: str = "all",
):
    """Cost matrices + annealed loop (`resamplers.py:182-191`).

    Each cost matrix detaches its second operand, as in the reference.
    The reference also builds ``cost_xx``/``cost_yy`` for its dead
    debiasing potentials (see ``sinkhorn_loop``) — not materialised here.
    """
    sg = jax.lax.stop_gradient
    cost_xy = cost(x, sg(y))
    cost_yx = cost(y, sg(x))
    scale = sg(max_min(x, y))
    return sinkhorn_loop(
        log_alpha, log_beta, cost_xy, cost_yx,
        epsilon, scale, scaling, threshold, max_iter, convergence
    )


def transport_from_potentials(
    x: Array, f: Array, g: Array, eps: float, logw: Array, n: int
) -> Array:
    """Assemble the (column-normalised) transport matrix (`resamplers.py:194-210`).

    T_ij = n · w_j · softmax_i((f_i + g_j − C_ij)/ε): each column j sums to
    n·w_j, so ``T @ x`` with uniform output weights preserves the weighted
    empirical measure.
    """
    log_n = math.log(n)
    cost_matrix = cost(x, x)
    fg = f[:, :, None] + g[:, None, :]
    temp = (fg - cost_matrix) / eps
    temp = temp - jax.nn.logsumexp(temp, axis=1, keepdims=True) + log_n
    temp = temp + logw[:, None, :]
    return jnp.exp(temp)


def sinkhorn_transport(
    x: Array,
    logw: Array,
    eps: float,
    scaling: float,
    threshold: float,
    max_iter: int,
    convergence: str = "all",
) -> Array:
    """Full transport-matrix construction (`resamplers.py:211-227`):
    center, scale by diameter·√d, run Sinkhorn vs the uniform measure on the
    same support, assemble T."""
    n = x.shape[1]
    d = x.shape[-1]
    sg = jax.lax.stop_gradient
    uniform_logw = jnp.full_like(logw, -math.log(n))
    centered = x - sg(jnp.mean(x, axis=1, keepdims=True))
    diam = diameter(x, x)
    scale = sg(diam[:, None, None] * math.sqrt(d))
    scaled_x = centered / scale
    alpha, beta, _ = sinkhorn_potentials(
        logw, scaled_x, uniform_logw, scaled_x,
        eps, scaling, threshold, max_iter, convergence
    )
    return transport_from_potentials(scaled_x, alpha, beta, eps, logw, n)


def ot_resample(
    particles: Array,
    probs: Array,
    eps: float = 0.1,
    scaling: float = 0.75,
    threshold: float = 1e-3,
    max_iter: int = 100,
    transport_grad: bool = False,
    convergence: str = "all",
) -> Tuple[Array, Array, Array]:
    """Entropy-regularised OT resampling (`resamplers.py:62-70,267-277`).

    Args:
      particles: (B, N, d); probs: (B, N) linear weights.
      transport_grad: False → reference topology (T fully detached; gradient
        only via the particle operand of T@x).  True → differentiable final
        round (true OT-DPF).
    Returns:
      (particles', probs'=uniform, ancestor_idx=arange) — OT transport has no
      discrete ancestors; identity indices feed the pseudo-likelihood walk as
      in `resamplers.py:69`.
    """
    batch, n, _ = particles.shape
    logw = jnp.log(probs)
    if transport_grad:
        t = sinkhorn_transport(particles, logw, eps, scaling, threshold,
                               max_iter, convergence)
    else:
        t = jax.lax.stop_gradient(
            sinkhorn_transport(
                jax.lax.stop_gradient(particles), jax.lax.stop_gradient(logw),
                eps, scaling, threshold, max_iter, convergence
            )
        )
    transported = jnp.einsum("bij,bjd->bid", t, particles)
    uniform = jnp.full_like(probs, 1.0 / n)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (batch, n))
    return transported, uniform, idx
