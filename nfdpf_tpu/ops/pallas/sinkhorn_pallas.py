"""Flash-style Pallas kernels for large-N entropy-regularised OT resampling.

The dense Sinkhorn path (`nfdpf_tpu/ops/sinkhorn.py`) materialises (B, N, N)
cost matrices — at N=10k that is 400 MB per matrix in HBM and every softmin
re-reads it.  These kernels stream instead: each row block recomputes its
cost block on the fly from the (N, d) particle coordinates (d=2 → a handful
of VPU ops per tile) while maintaining a running max/sum logsumexp, exactly
the FlashAttention recurrence.  HBM traffic drops from O(N²) to O(N·d) per
softmin — bandwidth-optimal for this op.

Kernels:
  * ``streaming_lse``       out_i = logsumexp_j(f_j − C_ij/ε)
  * ``streaming_softmin``   −ε · streaming_lse  (`resamplers.py:94-110`)
  * ``streaming_transport_apply``  out = T @ v without building
        T_ij = exp(r_i + c_j − C_ij/ε)
    (`resamplers.py:194-210` + the T@x of `resamplers.py:256`), with a
    custom VJP that streams Tᵀ@g for the particle-value gradient — the exact
    gradient topology of the reference (T itself detached,
    `resamplers.py:234-245`).
  * ``ot_resample_pallas``  the full ε-annealed self-transport resampler.

Self-transport only (y ≡ x), which is the particle-resampling case.

TPU layout notes: per-batch vectors ride as (B, 1, N) so every block's last
two dims satisfy Mosaic's (8, 128) tiling rules; ε rides whole-array in SMEM
indexed by ``pl.program_id(0)``; row/col blocks are multiples of 128.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_ROWS = 256
BLOCK_COLS = 512
NEG_INF = -1e30

_INTERPRET = False  # force-flipped by tests; CPU auto-detects (see _interp)


def _interp() -> bool:
    """Interpret-mode Pallas off-TPU (CPU virtual meshes, dryrun_multichip)."""
    return _INTERPRET or jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis1(x: Array, n_pad: int, value: float = 0.0) -> Array:
    pad = n_pad - x.shape[1]
    if pad == 0:
        return x
    cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, cfg, constant_values=value)


def _blocks(n: int, m: int) -> Tuple[int, int, int, int]:
    """(block_rows, block_cols, n_pad, m_pad), all multiples of 128."""
    block_rows = min(BLOCK_ROWS, _round_up(n, 128))
    block_cols = min(BLOCK_COLS, _round_up(m, 128))
    return block_rows, block_cols, _round_up(n, block_rows), _round_up(m, block_cols)


# ---------------------------------------------------------------------------
# streaming logsumexp
# ---------------------------------------------------------------------------


def _lse_kernel(eps_ref, x_ref, y_ref, f_ref, o_ref, *, block_cols, n_cols,
                dim, groups):
    """One (batch, row-block) program: streaming logsumexp over column blocks
    for ``groups`` potential vectors SHARING one cost computation — one
    Sinkhorn iteration needs 4 softmins over the same cost matrix
    (`resamplers.py:135-141`), so fusing them quarters the distance math and
    the x/y traffic.

    eps_ref: (B, 1) whole-array SMEM; x_ref: (1, d, BR); y_ref: (1, d, M);
    f_ref: (1, G, M); o_ref: (1, G, BR).

    Coordinates ride d-MAJOR (minor dim = particle axis): a (M, d) block
    with d=2 pads the 2 to 128 lanes — 5.24 MB of VMEM per buffer at
    N=10240, which double-buffered blows the 16 MB scoped-VMEM budget.
    (d, M) pads d to 8 sublanes instead: 0.33 MB.
    """
    eps = eps_ref[pl.program_id(0), 0]
    block_rows = x_ref.shape[2]
    num_blocks = n_cols // block_cols

    def body(j, carry):
        m, s = carry                                           # (G, BR) each
        dist2 = jnp.zeros((block_rows, block_cols), jnp.float32)
        for k in range(dim):
            yk = y_ref[0, k, pl.ds(j * block_cols, block_cols)]   # (BC,)
            diff = x_ref[0, k, :][:, None] - yk[None, :]
            dist2 = dist2 + diff * diff
        neg_cost = -0.5 * dist2 / eps                          # (BR, BC)
        new_ms, new_ss = [], []
        for g in range(groups):
            fb = f_ref[0, g, pl.ds(j * block_cols, block_cols)]
            val = fb[None, :] + neg_cost
            bm = jnp.max(val, axis=1)                          # (BR,)
            new_m = jnp.maximum(m[g], bm)
            new_s = s[g] * jnp.exp(m[g] - new_m) + jnp.sum(
                jnp.exp(val - new_m[:, None]), axis=1
            )
            new_ms.append(new_m)
            new_ss.append(new_s)
        return jnp.stack(new_ms), jnp.stack(new_ss)

    m0 = jnp.full((groups, block_rows), NEG_INF, jnp.float32)
    s0 = jnp.zeros((groups, block_rows), jnp.float32)
    m, s = jax.lax.fori_loop(0, num_blocks, body, (m0, s0))
    o_ref[0, :, :] = m + jnp.log(s)


def streaming_lse_multi(eps: Array, x: Array, y: Array, fs: Array) -> Array:
    """out[g, i] = logsumexp_j(fs[g, j] − ||x_i−y_j||²/(2ε)), batched.

    eps: (B,); x: (B, N, d); y: (B, M, d); fs: (B, G, M) → (B, G, N).
    """
    b, n, d = x.shape
    g, m = fs.shape[1], fs.shape[2]
    block_rows, block_cols, n_pad, m_pad = _blocks(n, m)
    xp = _pad_axis1(x, n_pad).transpose(0, 2, 1)     # (B, d, Npad) d-major
    yp = _pad_axis1(y, m_pad).transpose(0, 2, 1)     # (B, d, Mpad)
    fp = jnp.pad(fs, ((0, 0), (0, 0), (0, m_pad - m)),
                 constant_values=NEG_INF)
    eps2d = eps.reshape(b, 1).astype(jnp.float32)

    out = pl.pallas_call(
        partial(_lse_kernel, block_cols=block_cols, n_cols=m_pad, dim=d,
                groups=g),
        grid=(b, n_pad // block_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d, block_rows), lambda bi, ri: (bi, 0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m_pad), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, m_pad), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_rows), lambda bi, ri: (bi, 0, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, n_pad), jnp.float32),
        interpret=_interp(),
    )(eps2d, xp, yp, fp)
    return out[:, :, :n]


def streaming_lse(eps: Array, x: Array, y: Array, f: Array) -> Array:
    """Single-potential wrapper: (B, M) → (B, N)."""
    return streaming_lse_multi(eps, x, y, f[:, None, :])[:, 0]


def streaming_softmin(eps, x, y, f) -> Array:
    """−ε·logsumexp(f − C/ε): the Sinkhorn softmin (`resamplers.py:94-110`)."""
    return -eps[:, None] * streaming_lse(eps, x, y, f)


def streaming_softmin_multi(eps, x, y, fs) -> Array:
    """Fused G-potential softmin: fs (B, G, M) → (B, G, N)."""
    return -eps[:, None, None] * streaming_lse_multi(eps, x, y, fs)


# ---------------------------------------------------------------------------
# streaming transport apply (with custom VJP)
# ---------------------------------------------------------------------------


def _apply_kernel(
    eps_ref, x_ref, y_ref, v_ref, r_ref, c_ref, o_ref,
    *, block_cols, n_cols, dim, vdim,
):
    """out_i = Σ_j exp(r_i + c_j − C_ij/ε) · v_j.

    d-major layout (see ``_lse_kernel``): x_ref (1, d, BR) row positions;
    y_ref (1, d, M) column positions; v_ref (1, vd, M) column values;
    r_ref (1, 1, BR); c_ref (1, 1, M); o_ref (1, vd, BR).
    """
    eps = eps_ref[pl.program_id(0), 0]
    block_rows = x_ref.shape[2]
    num_blocks = n_cols // block_cols
    r = r_ref[0, 0, :][:, None]                                # (BR, 1)

    def body(j, acc):
        vb = v_ref[0, :, pl.ds(j * block_cols, block_cols)]    # (vd, BC)
        cb = c_ref[0, 0, pl.ds(j * block_cols, block_cols)]
        dist2 = jnp.zeros((block_rows, block_cols), jnp.float32)
        for k in range(dim):
            yk = y_ref[0, k, pl.ds(j * block_cols, block_cols)]
            diff = x_ref[0, k, :][:, None] - yk[None, :]
            dist2 = dist2 + diff * diff
        t = jnp.exp(r + cb[None, :] - 0.5 * dist2 / eps)        # (BR, BC)
        return acc + jax.lax.dot_general(
            t, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc0 = jnp.zeros((block_rows, vdim), jnp.float32)
    acc = jax.lax.fori_loop(0, num_blocks, body, acc0)          # (BR, vd)
    o_ref[0, :, :] = acc.T


def _apply_impl(eps, x_rows, y_cols, values, r, c) -> Array:
    b, n, d = x_rows.shape
    m, vd = values.shape[1], values.shape[2]
    block_rows, block_cols, n_pad, m_pad = _blocks(n, m)
    out = pl.pallas_call(
        partial(_apply_kernel, block_cols=block_cols, n_cols=m_pad, dim=d,
                vdim=vd),
        grid=(b, n_pad // block_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d, block_rows), lambda bi, ri: (bi, 0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m_pad), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vd, m_pad), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_rows), lambda bi, ri: (bi, 0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, vd, block_rows), lambda bi, ri: (bi, 0, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, vd, n_pad), jnp.float32),
        interpret=_interp(),
    )(
        eps.reshape(b, 1).astype(jnp.float32),
        _pad_axis1(x_rows, n_pad).transpose(0, 2, 1),
        _pad_axis1(y_cols, m_pad).transpose(0, 2, 1),
        _pad_axis1(values, m_pad).transpose(0, 2, 1),
        _pad_axis1(r, n_pad, NEG_INF)[:, None, :],
        _pad_axis1(c, m_pad, NEG_INF)[:, None, :],
    )
    return out[:, :, :n].transpose(0, 2, 1)


@partial(jax.custom_vjp, nondiff_argnums=())
def transport_apply_rc(values, eps, x_rows, y_cols, r, c):
    """out = T @ values with implicit T_ij = exp(r_i + c_j − C_ij/ε),
    C_ij = ½‖x_rows_i − y_cols_j‖², with separate row/column point sets
    (the particle-sharded case: rows local to the shard, columns gathered).

    Differentiable in ``values`` only (grad = Tᵀ @ g, streamed); all other
    inputs are treated as constants — the reference's exact gradient
    topology (`resamplers.py:234-245,256`).
    """
    return _apply_impl(eps, x_rows, y_cols, values, r, c)


def _rc_fwd(values, eps, x_rows, y_cols, r, c):
    out = _apply_impl(eps, x_rows, y_cols, values, r, c)
    return out, (eps, x_rows, y_cols, r, c)


def _rc_bwd(res, g):
    eps, x_rows, y_cols, r, c = res
    # (Tᵀ g)_j = Σ_i exp(c_j + r_i − C_ij/ε) g_i  — same kernel, roles
    # swapped.  Under particle sharding this is the shard-local partial
    # over rows i; the enclosing (differentiable) all_gather's transpose
    # psum-scatters the partials into the exact global gradient.
    grad_values = _apply_impl(eps, y_cols, x_rows, g, c, r)
    return grad_values, None, None, None, None, None


transport_apply_rc.defvjp(_rc_fwd, _rc_bwd)


def streaming_transport_apply(values, eps, scaled_x, r, c):
    """Self-transport wrapper (rows = columns = scaled_x)."""
    return transport_apply_rc(values, eps, scaled_x, scaled_x, r, c)


# ---------------------------------------------------------------------------
# full resampler
# ---------------------------------------------------------------------------


def ot_resample_pallas(
    particles: Array,
    probs: Array,
    eps: float = 0.1,
    scaling: float = 0.75,
    threshold: float = 1e-3,
    max_iter: int = 100,
    convergence: str = "all",
    axis_name: str | None = None,
    warm_start: Tuple[Array, Array] | None = None,
    warm_eps_factor: float = 16.0,
    return_extras: bool = False,
):
    """ε-annealed OT resampling with streaming kernels.

    Semantics of ``ops.sinkhorn.ot_resample(transport_grad=False)``: the
    transport plan is fully detached; gradient reaches the particles only
    through the value operand of T@x (custom VJP above).

    ``axis_name``: when run per-shard under ``shard_map`` over the batch
    ('data') axis, the loop's stopping decision is aggregated across shards
    so the iteration count — and therefore the numerics — match the
    unsharded call exactly (the dense path gets this for free from GSPMD's
    global reduction of the while-loop condition).

    ``warm_start``: optional ``(potentials, valid)`` with potentials
    (B, 2, N) — the (a_y, b_x) this resampler returned from the
    PREVIOUS ESS-gate firing — and ``valid`` a scalar bool (False on the
    first firing).  When valid, the annealing loop starts from those
    potentials at the TARGET ε instead of re-annealing from diameter²
    (`resamplers.py:117-118` restarts every call): between firings the
    particle cloud moves only a few motion/proposal steps, so the previous
    fixed point is an excellent initial guess and the loop typically needs
    a small fraction of the cold iteration count.  The entire annealing
    loop is detached (`resamplers.py:270` semantics) so warm-starting
    changes ITERATION COUNT ONLY — the gradient topology and the fixed
    point being approximated (symmetric Sinkhorn at target ε, threshold-
    converged) are untouched.

    ``return_extras``: also return ``{"potentials": (B, 2, N),
    "iters": scalar int32}`` for warm-start carry and cost telemetry.
    """
    from nfdpf_tpu.ops.sinkhorn import diameter, max_min

    sg = jax.lax.stop_gradient
    b, n, d = particles.shape
    logw = jnp.log(probs)

    x_sg = sg(particles)
    logw_sg = sg(logw)
    centered = x_sg - jnp.mean(x_sg, axis=1, keepdims=True)
    diam = diameter(x_sg, x_sg)
    scaled_x = centered / (diam[:, None, None] * math.sqrt(d))
    uniform_logw = jnp.full_like(logw_sg, -math.log(n))

    eps_target = jnp.asarray(eps, jnp.float32)
    eps0 = (max_min(scaled_x, scaled_x) ** 2).astype(jnp.float32)
    scaling_factor = scaling**2

    sm = lambda e, fvec: streaming_softmin(e, scaled_x, scaled_x, fvec)  # noqa: E731
    sm4 = lambda e, fvecs: streaming_softmin_multi(  # noqa: E731
        e, scaled_x, scaled_x, fvecs
    )

    # Only (a_y, b_x) are live state: the reference's symmetric loop also
    # carries (a_x, b_y) — the self-transport "xx"/"yy" potentials — but
    # they never influence a_y/b_x (each updates only from itself), the
    # convergence test reads only a_y/b_x diffs, and the transport assembly
    # consumes only (a_y, b_x) (`resamplers.py:190-191` discards them:
    # ``alpha, beta, _, _, _``).  They are a Sinkhorn-divergence debiasing
    # vestige — dead in the resampling use.  Dropping them HALVES the fused
    # kernel's group count (the dominant per-iteration cost) while leaving
    # the a_y/b_x trajectories bit-identical.
    def _cold_init():
        init = sm4(eps0, jnp.stack([logw_sg, uniform_logw], axis=1))
        return init[:, 0], init[:, 1]

    if warm_start is not None:
        pots_prev, valid = warm_start
        pots_prev = sg(pots_prev)
        # lax.cond, not where: a warm firing must not pay the cold-init
        # softmin kernel pass only to discard it
        a_y, b_x = jax.lax.cond(
            valid,
            lambda: (pots_prev[:, 0], pots_prev[:, 1]),
            _cold_init,
        )
        # keep a SHORT annealing tail (from warm_eps_factor·ε_target instead
        # of diameter²): fixed-ε Sinkhorn at small ε converges slowly when
        # the warm guess is stale (weights re-degenerate between firings),
        # so skipping annealing entirely can LOSE to cold start — annealing
        # the last few decades re-smooths while the warm potentials skip the
        # top ones.  Measured in tests/test_filter.py.
        eps_warm = jnp.maximum(
            jnp.minimum(eps0, eps_target * warm_eps_factor), eps_target
        )
        eps0 = jnp.where(valid, eps_warm, eps0)
    else:
        a_y, b_x = _cold_init()

    def cond_fn(state):
        i, _, _, running, _ = state
        it_ok = i < max_iter - 1
        agg = jnp.all(running) if convergence == "all" else jnp.any(running)
        if axis_name is not None:
            # global aggregation over batch shards: 'all' = every shard's
            # local all (pmin), 'any' = any shard's local any (pmax)
            agg_i = agg.astype(jnp.int32)
            agg = (
                jax.lax.pmin(agg_i, axis_name) if convergence == "all"
                else jax.lax.pmax(agg_i, axis_name)
            ) > 0
        return jnp.logical_and(it_ok, agg)

    def body_fn(state):
        i, a_y, b_x, running, eps_run = state
        eps_col = eps_run[:, None]
        run = running[:, None]
        # one fused kernel for both live softmins (shared cost blocks)
        outs = sm4(eps_run, jnp.stack([
            logw_sg + b_x / eps_col,
            uniform_logw + a_y / eps_col,
        ], axis=1))
        at_y = jnp.where(run, outs[:, 0], a_y)
        bt_x = jnp.where(run, outs[:, 1], b_x)
        a_y_new, b_x_new = (a_y + at_y) / 2, (b_x + bt_x) / 2
        a_diff = jnp.max(jnp.abs(a_y_new - a_y), axis=1)
        b_diff = jnp.max(jnp.abs(b_x_new - b_x), axis=1)
        local = jnp.logical_or(a_diff > threshold, b_diff > threshold)
        new_eps = jnp.maximum(eps_run * scaling_factor, eps_target)
        glob = jnp.logical_or(new_eps < eps_run, local)
        return i + 1, a_y_new, b_x_new, glob, new_eps

    state0 = (jnp.asarray(0), a_y, b_x, jnp.ones((b,), bool), eps0)
    n_iter, a_y, b_x, _, _ = jax.lax.while_loop(cond_fn, body_fn, state0)

    eps_b = jnp.broadcast_to(eps_target, (b,))
    finals = sm4(eps_b, jnp.stack([
        logw_sg + b_x / eps_b[:, None],
        uniform_logw + a_y / eps_b[:, None],
    ], axis=1))
    final_f, final_g = finals[:, 0], finals[:, 1]   # final a_y, b_x

    # transport weights in log space (`resamplers.py:194-210`):
    # T_ij = exp((f_i + g_j − C_ij)/ε − colnorm_j + log n + logw_j)
    # colnorm_j = logsumexp_i((f_i + g_j − C_ij)/ε)
    #           = g_j/ε + logsumexp_i(f_i/ε − C_ij/ε)    [C symmetric]
    lse_col = streaming_lse(eps_b, scaled_x, scaled_x, final_f / eps_b[:, None])
    colnorm = final_g / eps_b[:, None] + lse_col
    r = final_f / eps_b[:, None]                                 # row term
    c = (final_g / eps_b[:, None] - colnorm + math.log(n) + logw_sg)

    # apply to RAW particle values (reference applies T to raw particles,
    # `resamplers.py:256`); cost geometry stays in scaled coordinates.
    transported = streaming_transport_apply(particles, eps_b, scaled_x, r, c)
    uniform = jnp.full_like(probs, 1.0 / n)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
    if return_extras:
        extras = {
            "potentials": jnp.stack([a_y, b_x], axis=1),
            "iters": n_iter.astype(jnp.int32),
        }
        return transported, uniform, idx, extras
    return transported, uniform, idx


# ---------------------------------------------------------------------------
# particle-sharded resampler (shard_map body)
# ---------------------------------------------------------------------------


def ot_resample_pallas_sharded(
    particles: Array,
    probs: Array,
    *,
    particle_axis: str,
    data_axis: str | None = None,
    eps: float = 0.1,
    scaling: float = 0.75,
    threshold: float = 1e-3,
    max_iter: int = 100,
    convergence: str = "all",
    warm_start: Tuple[Array, Array] | None = None,
    warm_eps_factor: float = 16.0,
    return_extras: bool = False,
):
    """Streaming OT resampling with the PARTICLE axis sharded across chips.

    Per-shard body for ``shard_map``: ``particles`` is the local column
    block (B_loc, N/S, d).  The O(N²) cost matrix is never materialised
    anywhere; what crosses ICI is only O(N·d) per iteration:

      * the (detached) particle coordinates and log-weights are all-gathered
        once — every shard then evaluates softmins for its LOCAL rows
        against ALL columns with the same flash kernels as the unsharded
        path (per-shard compute N·N/S, memory O(N·d));
      * the four row potentials (B, N/S each) are all-gathered per Sinkhorn
        iteration (they are next iteration's column-side inputs);
      * the convergence test max|Δpotential| gets a ``pmax`` over the
        particle axis (and the stop decision the usual data-axis
        aggregation), so the iteration count — and hence the numerics —
        match the unsharded kernel exactly;
      * the final T@x all-gathers the RAW particle values differentiably:
        the custom VJP streams each shard's partial Tᵀg over its local rows
        and ``all_gather``'s transpose psum-scatters them into the exact
        global value-gradient (the reference's gradient topology,
        `resamplers.py:234-245,256`).

    Semantics: `resamplers.py:94-210` (ε-annealed symmetric Sinkhorn,
    averaging step, per-batch freezing, final differentiable round).
    """
    sg = jax.lax.stop_gradient
    b, n_loc, d = particles.shape
    shards = jax.lax.psum(1, particle_axis)
    n = n_loc * shards
    my = jax.lax.axis_index(particle_axis)

    from nfdpf_tpu.ops.sinkhorn import diameter, max_min

    # detached global geometry — O(N·d), gathered once
    x_all = jax.lax.all_gather(sg(particles), particle_axis, axis=1,
                               tiled=True)                       # (B, N, d)
    logw_all = jnp.log(jax.lax.all_gather(sg(probs), particle_axis,
                                          axis=1, tiled=True))   # (B, N)
    centered = x_all - jnp.mean(x_all, axis=1, keepdims=True)
    diam = diameter(x_all, x_all)
    scaled_all = centered / (diam[:, None, None] * math.sqrt(d))
    scaled_loc = jax.lax.dynamic_slice_in_dim(scaled_all, my * n_loc, n_loc,
                                              axis=1)            # (B, N/S, d)
    uniform_all = jnp.full_like(logw_all, -math.log(n))

    eps_target = jnp.asarray(eps, jnp.float32)
    eps0 = (max_min(scaled_all, scaled_all) ** 2).astype(jnp.float32)
    scaling_factor = scaling**2

    # local-row softmin against gathered columns
    sm4 = lambda e, fs_all: streaming_softmin_multi(  # noqa: E731
        e, scaled_loc, scaled_all, fs_all
    )

    def gather_pots(*pots):
        """(B, N/S) row potentials → (B, k, N) column-side inputs."""
        return jax.lax.all_gather(jnp.stack(pots, axis=1), particle_axis,
                                  axis=2, tiled=True)

    # only (a_y, b_x) are live — see the unsharded kernel's note on the
    # reference's dead (a_x, b_y) debiasing potentials
    def _cold_init():
        init = sm4(eps0, jnp.stack([logw_all, uniform_all], axis=1))
        return init[:, 0], init[:, 1]                # (B, N/S) local rows

    if warm_start is not None:
        # pots_prev: this shard's LOCAL row block (B, 2, N/S) — the carry
        # is sharded with the particle axis, so each shard receives exactly
        # the rows it owns.  ``valid`` is replicated, so every shard takes
        # the same cond branch (no collectives inside either branch).
        pots_prev, valid = warm_start
        pots_prev = sg(pots_prev)
        a_y, b_x = jax.lax.cond(
            valid,
            lambda: (pots_prev[:, 0], pots_prev[:, 1]),
            _cold_init,
        )
        eps_warm = jnp.maximum(
            jnp.minimum(eps0, eps_target * warm_eps_factor), eps_target
        )
        eps0 = jnp.where(valid, eps_warm, eps0)
    else:
        a_y, b_x = _cold_init()

    def cond_fn(state):
        i, _, _, running, _ = state
        it_ok = i < max_iter - 1
        agg = jnp.all(running) if convergence == "all" else jnp.any(running)
        if data_axis is not None:
            agg_i = agg.astype(jnp.int32)
            agg = (
                jax.lax.pmin(agg_i, data_axis) if convergence == "all"
                else jax.lax.pmax(agg_i, data_axis)
            ) > 0
        return jnp.logical_and(it_ok, agg)

    def body_fn(state):
        i, a_y, b_x, running, eps_run = state
        pots = gather_pots(a_y, b_x)                            # (B, 2, N)
        eps_col = eps_run[:, None]
        run = running[:, None]
        outs = sm4(eps_run, jnp.stack([
            logw_all + pots[:, 1] / eps_col,
            uniform_all + pots[:, 0] / eps_col,
        ], axis=1))
        at_y = jnp.where(run, outs[:, 0], a_y)
        bt_x = jnp.where(run, outs[:, 1], b_x)
        a_y_new, b_x_new = (a_y + at_y) / 2, (b_x + bt_x) / 2
        # convergence over the FULL potential vectors: local max, then pmax
        a_diff = jax.lax.pmax(
            jnp.max(jnp.abs(a_y_new - a_y), axis=1), particle_axis)
        b_diff = jax.lax.pmax(
            jnp.max(jnp.abs(b_x_new - b_x), axis=1), particle_axis)
        local = jnp.logical_or(a_diff > threshold, b_diff > threshold)
        new_eps = jnp.maximum(eps_run * scaling_factor, eps_target)
        glob = jnp.logical_or(new_eps < eps_run, local)
        return i + 1, a_y_new, b_x_new, glob, new_eps

    state0 = (jnp.asarray(0), a_y, b_x, jnp.ones((b,), bool), eps0)
    n_iter, a_y, b_x, _, _ = jax.lax.while_loop(cond_fn, body_fn, state0)

    eps_b = jnp.broadcast_to(eps_target, (b,))
    pots = gather_pots(a_y, b_x)                                 # (B, 2, N)
    finals = sm4(eps_b, jnp.stack([
        logw_all + pots[:, 1] / eps_b[:, None],
        uniform_all + pots[:, 0] / eps_b[:, None],
    ], axis=1))
    final_f, final_g = finals[:, 0], finals[:, 1]    # (B, N/S) local rows

    # colnorm for LOCAL columns j needs all rows i: C is symmetric, so the
    # row/col roles of the streaming lse swap for free
    f_all = jax.lax.all_gather(final_f, particle_axis, axis=1, tiled=True)
    lse_col = streaming_lse(eps_b, scaled_loc, scaled_all,
                            f_all / eps_b[:, None])
    colnorm = final_g / eps_b[:, None] + lse_col
    r_loc = final_f / eps_b[:, None]
    logw_loc = jnp.log(sg(probs))
    c_loc = final_g / eps_b[:, None] - colnorm + math.log(n) + logw_loc
    c_all = jax.lax.all_gather(c_loc, particle_axis, axis=1, tiled=True)

    # RAW particle values gathered DIFFERENTIABLY (grad: psum-scatter)
    values_all = jax.lax.all_gather(particles, particle_axis, axis=1,
                                    tiled=True)
    transported = transport_apply_rc(values_all, eps_b, scaled_loc,
                                     scaled_all, r_loc, c_all)
    uniform = jnp.full_like(probs, 1.0 / n)
    idx = (my * n_loc
           + jnp.broadcast_to(jnp.arange(n_loc, dtype=jnp.int32)[None, :],
                              (b, n_loc))).astype(jnp.int32)
    if return_extras:
        extras = {
            "potentials": jnp.stack([a_y, b_x], axis=1),  # local rows
            "iters": n_iter.astype(jnp.int32),
        }
        return transported, uniform, idx, extras
    return transported, uniform, idx
