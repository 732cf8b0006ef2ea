"""Fused coupling-chain Pallas kernel.

One kernel applies an ENTIRE RealNVP chain (K blocks × 4 conditioner MLPs
each) to a block of particle rows, accumulating the log-det — the reference
runs 2 blocks × 4 × 3 linear layers as ~24 separate framework ops per flow
call (`nf/flows.py:155-239`, `nf/models.py:13-30`).  Here all conditioner
weights (a few KB) stay resident in VMEM and every intermediate lives in
registers: one HBM read of the particle rows, one write of the outputs.

Supports the framework's filter configuration: state dim 2 (half = 1),
arbitrary context width, K chain blocks, forward and inverse.  Weights are
packed from a ``FlowChain`` variables pytree by ``pack_chain_params``.

The kernel computes identically to ``FlowChain.forward/inverse`` (verified
in tests/test_pallas_coupling.py).  Gradients run through a fused Pallas
BACKWARD kernel (``_chain_bwd_kernel``): round-4 measurement showed the
earlier dense-VJP fallback made training with the fused forward a net loss
(58.5 vs 46.2 ms/step at CNF N=1000), so the backward recomputes the
forward in VMEM and emits input/context grads plus per-grid-block
weight-grad partials in one pass; gradient parity vs autodiff of the dense
chain is tested to 2e-5.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_ROWS = 512

_INTERPRET = False  # force-flipped by tests; CPU auto-detects (see _interp)


def _interp() -> bool:
    """Interpret-mode Pallas off-TPU (CPU virtual meshes, dryrun_multichip)."""
    return _INTERPRET or jax.default_backend() != "tpu"



def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_chain_params(variables, n_blocks: int, ctx_dim: int,
                      hidden: int = 8) -> Tuple[Array, Array]:
    """Pack a FlowChain (dim=2) params pytree into dense weight/bias stacks.

    Returns (weights, biases):
      weights: (K, 4, 3, max_in, hidden) — per block, per net (t1,s1,t2,s2),
               per layer; layer 0 consumes (1+ctx_dim) inputs, layers 1-2
               consume ``hidden``; output layer uses column 0 only.
      biases:  (K, 4, 3, hidden)
    """
    params = variables["params"]
    max_in = max(1 + ctx_dim, hidden)

    def padded(kern, bias):
        # kern (in, out) → (max_in, hidden); bias (out,) → (hidden,)
        kern = jnp.asarray(kern)
        bias = jnp.asarray(bias)
        kern = jnp.pad(kern, ((0, max_in - kern.shape[0]),
                              (0, hidden - kern.shape[1])))
        bias = jnp.pad(bias, (0, hidden - bias.shape[0]))
        return kern, bias

    w_rows, b_rows = [], []
    for k in range(n_blocks):
        block = params[f"flows_{k}"]
        w_nets, b_nets = [], []
        for net in ("t1", "s1", "t2", "s2"):
            sub = block[net]
            ws, bs = zip(*(padded(sub[f"Dense_{li}"]["kernel"],
                                  sub[f"Dense_{li}"]["bias"])
                           for li in range(3)))
            w_nets.append(jnp.stack(ws))
            b_nets.append(jnp.stack(bs))
        w_rows.append(jnp.stack(w_nets))
        b_rows.append(jnp.stack(b_nets))
    return jnp.stack(w_rows), jnp.stack(b_rows)


def _mlp(x_in, w_ref, b_ref, k, ni, in_dim, hidden):
    """3-layer tanh MLP on (R, in_dim) rows using packed weights."""
    h = x_in @ w_ref[k, ni, 0, :in_dim, :] + b_ref[k, ni, 0, :]
    h = jnp.tanh(h)
    h = h @ w_ref[k, ni, 1, :hidden, :] + b_ref[k, ni, 1, :]
    h = jnp.tanh(h)
    out = h @ w_ref[k, ni, 2, :hidden, :1] + b_ref[k, ni, 2, :1]
    return out                                                   # (R, 1)


def _chain_kernel(x_ref, ctx_ref, w_ref, b_ref, o_ref, ld_ref,
                  *, n_blocks, ctx_dim, hidden, inverse):
    lower = x_ref[0, :, 0:1]
    upper = x_ref[0, :, 1:2]
    ld = jnp.zeros_like(lower)
    in_dim = 1 + ctx_dim

    def cat(half):
        if ctx_dim == 0:
            return half
        return jnp.concatenate([half, ctx_ref[0]], axis=-1)

    block_order = range(n_blocks) if not inverse else range(n_blocks - 1, -1, -1)
    for k in block_order:
        if not inverse:
            t1 = _mlp(cat(lower), w_ref, b_ref, k, 0, in_dim, hidden)
            s1 = _mlp(cat(lower), w_ref, b_ref, k, 1, in_dim, hidden)
            upper = t1 + upper * jnp.exp(s1)
            t2 = _mlp(cat(upper), w_ref, b_ref, k, 2, in_dim, hidden)
            s2 = _mlp(cat(upper), w_ref, b_ref, k, 3, in_dim, hidden)
            lower = t2 + lower * jnp.exp(s2)
            ld = ld + s1 + s2
        else:
            t2 = _mlp(cat(upper), w_ref, b_ref, k, 2, in_dim, hidden)
            s2 = _mlp(cat(upper), w_ref, b_ref, k, 3, in_dim, hidden)
            lower = (lower - t2) * jnp.exp(-s2)
            t1 = _mlp(cat(lower), w_ref, b_ref, k, 0, in_dim, hidden)
            s1 = _mlp(cat(lower), w_ref, b_ref, k, 1, in_dim, hidden)
            upper = (upper - t1) * jnp.exp(-s1)
            ld = ld - s1 - s2

    o_ref[0, :, 0:1] = lower
    o_ref[0, :, 1:2] = upper
    ld_ref[0, 0, :] = ld[:, 0]


def _chain_impl(x, ctx, weights, biases, inverse):
    b, n, d = x.shape
    assert d == 2, "fused kernel supports the filter's state dim (2)"
    ctx_dim = 0 if ctx is None else ctx.shape[-1]
    hidden = weights.shape[-1]
    n_blocks = weights.shape[0]
    block_rows = min(BLOCK_ROWS, _round_up(n, 128))
    n_pad = _round_up(n, block_rows)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    # ctx rides with at least one (unused) column so the block is never
    # zero-width
    ctx_p = (jnp.zeros((b, n_pad, 1), x.dtype) if ctx is None
             else jnp.pad(ctx, ((0, 0), (0, n_pad - n), (0, 0))))

    out, ld = pl.pallas_call(
        partial(_chain_kernel, n_blocks=n_blocks, ctx_dim=ctx_dim,
                hidden=hidden, inverse=inverse),
        grid=(b, n_pad // block_rows),
        in_specs=[
            pl.BlockSpec((1, block_rows, 2), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, max(ctx_dim, 1)),
                         lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # biases, whole
        ],
        out_specs=(
            pl.BlockSpec((1, block_rows, 2), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_rows), lambda bi, ri: (bi, 0, ri),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        ),
        interpret=_interp(),
    )(xp, ctx_p, weights, biases)
    return out[:, :n, :], ld[:, 0, :n]


def chain_apply_packed_dense(x, ctx, weights, biases, inverse=False):
    """Pure-jnp equivalent of the fused kernel on packed weights.

    Used as the differentiation rule for ``fused_coupling_chain`` (and as a
    cross-check in tests): the Pallas kernel computes the forward, autodiff
    of this function supplies the exact VJP w.r.t. x, ctx, and weights.
    """
    hidden = weights.shape[-1]
    n_blocks = weights.shape[0]
    ctx_dim = 0 if ctx is None else ctx.shape[-1]
    in_dim = 1 + ctx_dim
    lower, upper = x[..., 0:1], x[..., 1:2]
    ld = jnp.zeros(x.shape[:-1] + (1,))

    def cat(half):
        return half if ctx is None else jnp.concatenate([half, ctx], axis=-1)

    def mlp(k, ni, h_in):
        h = jnp.tanh(h_in @ weights[k, ni, 0, :in_dim, :] + biases[k, ni, 0])
        h = jnp.tanh(h @ weights[k, ni, 1, :hidden, :] + biases[k, ni, 1])
        return h @ weights[k, ni, 2, :hidden, :1] + biases[k, ni, 2, :1]

    order = range(n_blocks) if not inverse else range(n_blocks - 1, -1, -1)
    for k in order:
        if not inverse:
            t1, s1 = mlp(k, 0, cat(lower)), mlp(k, 1, cat(lower))
            upper = t1 + upper * jnp.exp(s1)
            t2, s2 = mlp(k, 2, cat(upper)), mlp(k, 3, cat(upper))
            lower = t2 + lower * jnp.exp(s2)
            ld = ld + s1 + s2
        else:
            t2, s2 = mlp(k, 2, cat(upper)), mlp(k, 3, cat(upper))
            lower = (lower - t2) * jnp.exp(-s2)
            t1, s1 = mlp(k, 0, cat(lower)), mlp(k, 1, cat(lower))
            upper = (upper - t1) * jnp.exp(-s1)
            ld = ld - s1 - s2
    return jnp.concatenate([lower, upper], axis=-1), ld[..., 0]


# ---------------------------------------------------------------------------
# fused backward kernel
# ---------------------------------------------------------------------------
#
# The chain's FLOPs are tiny (hidden=8 MLPs); training cost is dominated by
# HBM traffic and op-dispatch overhead.  A dense-XLA VJP re-materialises
# ~24 intermediate tensors per flow call; this kernel instead RECOMPUTES the
# forward inside VMEM from the block's input rows (flash-attention-style)
# and emits (g_x, g_ctx, per-grid-block partial g_w/g_b) in one pass.
# Measured round 4: forward-only fusion with the dense VJP was a net LOSS
# in training (58.5 vs 46.2 ms/step at CNF N=1000) — the backward is where
# the fusion matters.


def _mlp_fwd_cache(x_in, w_ref, b_ref, k, ni, in_dim, hidden):
    """Forward MLP keeping tanh activations for the backward."""
    h1 = jnp.tanh(x_in @ w_ref[k, ni, 0, :in_dim, :] + b_ref[k, ni, 0, :])
    h2 = jnp.tanh(h1 @ w_ref[k, ni, 1, :hidden, :] + b_ref[k, ni, 1, :])
    out = h2 @ w_ref[k, ni, 2, :hidden, :1] + b_ref[k, ni, 2, :1]
    return out, (h1, h2)


def _mlp_bwd(x_in, h1, h2, g_out, w_ref, k, ni, in_dim, hidden,
             gw_ref, gb_ref):
    """Backward of the 3-layer tanh MLP.

    Accumulates weight/bias grads into the (per-grid-block) gw/gb refs and
    returns g_x_in (R, in_dim).
    """
    # layer 3: out = h2 @ W3[:, :1] + b3[:1]
    gw_ref[0, 0, k, ni, 2, :hidden, :1] += h2.T @ g_out
    gb_ref[0, 0, k, ni, 2, :1] += jnp.sum(g_out, axis=0)
    g_h2 = g_out @ w_ref[k, ni, 2, :hidden, :1].T
    g_h2p = g_h2 * (1.0 - h2 * h2)
    # layer 2
    gw_ref[0, 0, k, ni, 1, :hidden, :] += h1.T @ g_h2p
    gb_ref[0, 0, k, ni, 1, :] += jnp.sum(g_h2p, axis=0)
    g_h1 = g_h2p @ w_ref[k, ni, 1, :hidden, :].T
    g_h1p = g_h1 * (1.0 - h1 * h1)
    # layer 1
    gw_ref[0, 0, k, ni, 0, :in_dim, :] += x_in.T @ g_h1p
    gb_ref[0, 0, k, ni, 0, :] += jnp.sum(g_h1p, axis=0)
    return g_h1p @ w_ref[k, ni, 0, :in_dim, :].T


def _chain_bwd_kernel(x_ref, ctx_ref, w_ref, b_ref, gy_ref, gld_ref,
                      gx_ref, gctx_ref, gw_ref, gb_ref,
                      *, n_blocks, ctx_dim, hidden, inverse):
    lower = x_ref[0, :, 0:1]
    upper = x_ref[0, :, 1:2]
    in_dim = 1 + ctx_dim
    gw_ref[...] = jnp.zeros(gw_ref.shape, jnp.float32)
    gb_ref[...] = jnp.zeros(gb_ref.shape, jnp.float32)
    g_ctx = jnp.zeros((lower.shape[0], max(ctx_dim, 1)), lower.dtype)

    def cat(half):
        if ctx_dim == 0:
            return half
        return jnp.concatenate([half, ctx_ref[0]], axis=-1)

    # forward sweep, caching block-boundary states (K is small: unrolled)
    states = []
    order = range(n_blocks) if not inverse else range(n_blocks - 1, -1, -1)
    for k in order:
        states.append((lower, upper))
        if not inverse:
            t1, _ = _mlp_fwd_cache(cat(lower), w_ref, b_ref, k, 0, in_dim, hidden)
            s1, _ = _mlp_fwd_cache(cat(lower), w_ref, b_ref, k, 1, in_dim, hidden)
            upper = t1 + upper * jnp.exp(s1)
            t2, _ = _mlp_fwd_cache(cat(upper), w_ref, b_ref, k, 2, in_dim, hidden)
            s2, _ = _mlp_fwd_cache(cat(upper), w_ref, b_ref, k, 3, in_dim, hidden)
            lower = t2 + lower * jnp.exp(s2)
        else:
            t2, _ = _mlp_fwd_cache(cat(upper), w_ref, b_ref, k, 2, in_dim, hidden)
            s2, _ = _mlp_fwd_cache(cat(upper), w_ref, b_ref, k, 3, in_dim, hidden)
            lower = (lower - t2) * jnp.exp(-s2)
            t1, _ = _mlp_fwd_cache(cat(lower), w_ref, b_ref, k, 0, in_dim, hidden)
            s1, _ = _mlp_fwd_cache(cat(lower), w_ref, b_ref, k, 1, in_dim, hidden)
            upper = (upper - t1) * jnp.exp(-s1)

    g_lower = gy_ref[0, :, 0:1]
    g_upper = gy_ref[0, :, 1:2]
    g_ld = gld_ref[0, 0, :][:, None]

    # reverse sweep
    for k, (lo_in, up_in) in zip(reversed(list(order)), reversed(states)):
        if not inverse:
            # recompute this block's internals from its input state
            a = cat(lo_in)
            t1, c_t1 = _mlp_fwd_cache(a, w_ref, b_ref, k, 0, in_dim, hidden)
            s1, c_s1 = _mlp_fwd_cache(a, w_ref, b_ref, k, 1, in_dim, hidden)
            up_mid = t1 + up_in * jnp.exp(s1)
            b = cat(up_mid)
            t2, c_t2 = _mlp_fwd_cache(b, w_ref, b_ref, k, 2, in_dim, hidden)
            s2, c_s2 = _mlp_fwd_cache(b, w_ref, b_ref, k, 3, in_dim, hidden)
            # lower_out = t2 + lo_in * exp(s2); ld += s1 + s2
            g_t2 = g_lower
            g_s2 = g_lower * lo_in * jnp.exp(s2) + g_ld
            g_lo_in = g_lower * jnp.exp(s2)
            g_b = (_mlp_bwd(b, *c_t2, g_t2, w_ref, k, 2, in_dim, hidden,
                            gw_ref, gb_ref)
                   + _mlp_bwd(b, *c_s2, g_s2, w_ref, k, 3, in_dim, hidden,
                              gw_ref, gb_ref))
            g_up_mid = g_upper + g_b[:, 0:1]
            if ctx_dim:
                g_ctx += g_b[:, 1:]
            # up_mid = t1 + up_in * exp(s1)
            g_t1 = g_up_mid
            g_s1 = g_up_mid * up_in * jnp.exp(s1) + g_ld
            g_up_in = g_up_mid * jnp.exp(s1)
            g_a = (_mlp_bwd(a, *c_t1, g_t1, w_ref, k, 0, in_dim, hidden,
                            gw_ref, gb_ref)
                   + _mlp_bwd(a, *c_s1, g_s1, w_ref, k, 1, in_dim, hidden,
                              gw_ref, gb_ref))
            g_lower = g_lo_in + g_a[:, 0:1]
            g_upper = g_up_in
            if ctx_dim:
                g_ctx += g_a[:, 1:]
        else:
            b = cat(up_in)
            t2, c_t2 = _mlp_fwd_cache(b, w_ref, b_ref, k, 2, in_dim, hidden)
            s2, c_s2 = _mlp_fwd_cache(b, w_ref, b_ref, k, 3, in_dim, hidden)
            lo_out = (lo_in - t2) * jnp.exp(-s2)
            a = cat(lo_out)
            t1, c_t1 = _mlp_fwd_cache(a, w_ref, b_ref, k, 0, in_dim, hidden)
            s1, c_s1 = _mlp_fwd_cache(a, w_ref, b_ref, k, 1, in_dim, hidden)
            # up_out = (up_in - t1) * exp(-s1); ld -= s1 + s2
            g_t1 = -g_upper * jnp.exp(-s1)
            up_out = (up_in - t1) * jnp.exp(-s1)
            g_s1 = -g_upper * up_out - g_ld
            g_up_in = g_upper * jnp.exp(-s1)
            g_a = (_mlp_bwd(a, *c_t1, g_t1, w_ref, k, 0, in_dim, hidden,
                            gw_ref, gb_ref)
                   + _mlp_bwd(a, *c_s1, g_s1, w_ref, k, 1, in_dim, hidden,
                              gw_ref, gb_ref))
            g_lo_out = g_lower + g_a[:, 0:1]
            if ctx_dim:
                g_ctx += g_a[:, 1:]
            # lo_out = (lo_in - t2) * exp(-s2)
            g_lo_in = g_lo_out * jnp.exp(-s2)
            g_t2 = -g_lo_out * jnp.exp(-s2)
            g_s2 = -g_lo_out * lo_out - g_ld
            g_b = (_mlp_bwd(b, *c_t2, g_t2, w_ref, k, 2, in_dim, hidden,
                            gw_ref, gb_ref)
                   + _mlp_bwd(b, *c_s2, g_s2, w_ref, k, 3, in_dim, hidden,
                              gw_ref, gb_ref))
            g_upper = g_up_in + g_b[:, 0:1]
            g_lower = g_lo_in
            if ctx_dim:
                g_ctx += g_b[:, 1:]

    gx_ref[0, :, 0:1] = g_lower
    gx_ref[0, :, 1:2] = g_upper
    gctx_ref[0] = g_ctx


def _chain_bwd_impl(x, ctx, weights, biases, gy, gld, inverse):
    b, n, _ = x.shape
    ctx_dim = 0 if ctx is None else ctx.shape[-1]
    hidden = weights.shape[-1]
    n_blocks = weights.shape[0]
    max_in = weights.shape[-2]
    block_rows = min(BLOCK_ROWS, _round_up(n, 128))
    n_pad = _round_up(n, block_rows)
    nrb = n_pad // block_rows
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    ctx_p = (jnp.zeros((b, n_pad, 1), x.dtype) if ctx is None
             else jnp.pad(ctx, ((0, 0), (0, n_pad - n), (0, 0))))
    gy_p = jnp.pad(gy, ((0, 0), (0, n_pad - n), (0, 0)))
    gld_p = jnp.pad(gld, ((0, 0), (0, n_pad - n)))[:, None, :]  # (b,1,npad)

    gx, gctx, gw_part, gb_part = pl.pallas_call(
        partial(_chain_bwd_kernel, n_blocks=n_blocks, ctx_dim=ctx_dim,
                hidden=hidden, inverse=inverse),
        grid=(b, nrb),
        in_specs=[
            pl.BlockSpec((1, block_rows, 2), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, max(ctx_dim, 1)),
                         lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # biases
            pl.BlockSpec((1, block_rows, 2), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_rows), lambda bi, ri: (bi, 0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_rows, 2), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, max(ctx_dim, 1)),
                         lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            # per-grid-step weight/bias grad partials; summed outside (XLA)
            pl.BlockSpec((1, 1) + weights.shape,
                         lambda bi, ri: (bi, ri, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + biases.shape,
                         lambda bi, ri: (bi, ri, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, max(ctx_dim, 1)), jnp.float32),
            jax.ShapeDtypeStruct((b, nrb) + weights.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, nrb) + biases.shape, jnp.float32),
        ),
        interpret=_interp(),
    )(xp, ctx_p, weights, biases, gy_p, gld_p)

    gx = gx[:, :n, :]
    gctx = gctx[:, :n, :] if ctx is not None else None
    gw = jnp.sum(gw_part, axis=(0, 1))
    gb = jnp.sum(gb_part, axis=(0, 1))
    return gx, gctx, gw, gb


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_coupling_chain(x, ctx, weights, biases, inverse=False):
    """Apply a packed RealNVP chain to (B, N, 2) rows in one fused kernel.

    Returns (y, log_det) identical to ``FlowChain.forward`` (log_det only —
    the prior term is separate) / ``FlowChain.inverse``.  Fully
    differentiable: the VJP is a fused Pallas backward kernel that
    recomputes the forward in VMEM (tests cross-check it against autodiff
    of ``chain_apply_packed_dense``).
    """
    return _chain_impl(x, ctx, weights, biases, inverse)


def _fcc_fwd(x, ctx, weights, biases, inverse):
    out = _chain_impl(x, ctx, weights, biases, inverse)
    return out, (x, ctx, weights, biases)


def _fcc_bwd(inverse, res, g):
    x, ctx, weights, biases = res
    gy, gld = g
    gx, gctx, gw, gb = _chain_bwd_impl(x, ctx, weights, biases, gy, gld,
                                       inverse)
    return gx, gctx, gw, gb


fused_coupling_chain.defvjp(_fcc_fwd, _fcc_bwd)
