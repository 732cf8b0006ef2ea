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
in tests/test_pallas_coupling.py); gradients fall back to the XLA path via
``jax.custom_vjp`` with a dense VJP — fusing the backward too is future
work, and the forward is the inference/filtering hot path.
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


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_coupling_chain(x, ctx, weights, biases, inverse=False):
    """Apply a packed RealNVP chain to (B, N, 2) rows in one fused kernel.

    Returns (y, log_det) identical to ``FlowChain.forward`` (log_det only —
    the prior term is separate) / ``FlowChain.inverse``.  Fully
    differentiable: the VJP runs through the dense equivalent.
    """
    return _chain_impl(x, ctx, weights, biases, inverse)


def _fcc_fwd(x, ctx, weights, biases, inverse):
    out = _chain_impl(x, ctx, weights, biases, inverse)
    return out, (x, ctx, weights, biases)


def _fcc_bwd(inverse, res, g):
    x, ctx, weights, biases = res
    if ctx is None:
        _, vjp = jax.vjp(
            lambda x_, w_, b_: chain_apply_packed_dense(x_, None, w_, b_,
                                                        inverse),
            x, weights, biases,
        )
        gx, gw, gb = vjp(g)
        return gx, None, gw, gb
    _, vjp = jax.vjp(
        lambda x_, c_, w_, b_: chain_apply_packed_dense(x_, c_, w_, b_,
                                                        inverse),
        x, ctx, weights, biases,
    )
    return vjp(g)


fused_coupling_chain.defvjp(_fcc_fwd, _fcc_bwd)
