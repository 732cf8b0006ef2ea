"""Fused coupling-chain kernel vs the XLA FlowChain (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfdpf_tpu.ops.pallas.coupling_pallas as cp
from nfdpf_tpu.ops.flows import realnvp_chain


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(cp, "_INTERPRET", True)


@pytest.mark.parametrize("ctx_dim", [0, 4, 36])
@pytest.mark.parametrize("inverse", [False, True])
def test_fused_chain_matches_flowchain(ctx_dim, inverse):
    key = jax.random.PRNGKey(0)
    chain = realnvp_chain(2, 2, 8, init_std=0.3)
    x = jax.random.normal(key, (2, 50, 2))
    ctx = (jax.random.normal(jax.random.PRNGKey(1), (2, 50, ctx_dim))
           if ctx_dim else None)
    variables = chain.init(key, x, ctx)
    weights, biases = cp.pack_chain_params(variables, 2, ctx_dim)

    if inverse:
        y_ref, ld_ref = chain.apply(variables, x, ctx, method=chain.inverse)
    else:
        y_ref, _, ld_ref = chain.apply(variables, x, ctx, method=chain.forward)

    y, ld = cp.fused_coupling_chain(x, ctx, weights, biases, inverse=inverse)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref), rtol=1e-5,
                               atol=1e-5)


def test_fused_chain_roundtrip():
    key = jax.random.PRNGKey(2)
    chain = realnvp_chain(2, 2, 8, init_std=0.3)
    x = jax.random.normal(key, (1, 130, 2))     # non-multiple of block
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 130, 4))
    variables = chain.init(key, x, ctx)
    weights, biases = cp.pack_chain_params(variables, 2, 4)
    z, ld_f = cp.fused_coupling_chain(x, ctx, weights, biases, False)
    x_rec, ld_i = cp.fused_coupling_chain(z, ctx, weights, biases, True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)


@pytest.mark.parametrize("ctx_dim", [0, 4, 36])
@pytest.mark.parametrize("inverse", [False, True])
def test_fused_chain_backward_matches_dense_vjp(ctx_dim, inverse):
    """The fused Pallas backward (forward-recompute in VMEM) must produce
    the exact gradients of the dense packed chain, for x, ctx, weights and
    biases, in both directions."""
    key = jax.random.PRNGKey(5)
    chain = realnvp_chain(2, 2, 8, init_std=0.3)
    x = jax.random.normal(key, (2, 70, 2))      # non-multiple of 128
    ctx = (jax.random.normal(jax.random.PRNGKey(6), (2, 70, ctx_dim))
           if ctx_dim else None)
    variables = chain.init(key, x, ctx)
    weights, biases = cp.pack_chain_params(variables, 2, ctx_dim)

    def loss_fused(x_, c_, w_, b_):
        y, ld = cp.fused_coupling_chain(x_, c_, w_, b_, inverse)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld * ld)

    def loss_dense(x_, c_, w_, b_):
        y, ld = cp.chain_apply_packed_dense(x_, c_, w_, b_, inverse)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ld * ld)

    if ctx is None:
        g_f = jax.grad(lambda x_, w_, b_: loss_fused(x_, None, w_, b_),
                       argnums=(0, 1, 2))(x, weights, biases)
        g_d = jax.grad(lambda x_, w_, b_: loss_dense(x_, None, w_, b_),
                       argnums=(0, 1, 2))(x, weights, biases)
    else:
        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, ctx, weights,
                                                         biases)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(x, ctx, weights,
                                                         biases)
    for a, b in zip(g_f, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
