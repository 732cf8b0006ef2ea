"""Batched small-matrix linalg (ops/linalg.py) vs jnp.linalg.

These replace jnp.linalg.slogdet/inv inside Cond1x1Conv
(`nf/cglow/modules.py:165-182` semantics), so values AND gradients must
match the library versions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpf_tpu.ops import linalg


def _well_conditioned(key, b, n):
    W = jax.random.normal(key, (b, n, n))
    # tanh-bounded entries plus a diagonal boost: the regime Cond1x1Conv's
    # DenseNorm+tanh head actually produces
    return jnp.tanh(W) + 2.0 * jnp.eye(n)


@pytest.mark.parametrize("n", [2, 3, 12])
def test_logabsdet_matches_slogdet(n):
    W = _well_conditioned(jax.random.PRNGKey(0), 64, n)
    got = linalg.logabsdet(W)
    want = jnp.linalg.slogdet(W)[1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_logabsdet_with_negative_determinant():
    # swap two rows -> negative det; log|det| must be unchanged
    W = _well_conditioned(jax.random.PRNGKey(1), 8, 5)
    Wneg = W[:, jnp.array([1, 0, 2, 3, 4]), :]
    np.testing.assert_allclose(np.asarray(linalg.logabsdet(Wneg)),
                               np.asarray(jnp.linalg.slogdet(Wneg)[1]),
                               rtol=1e-5, atol=1e-5)


def test_logabsdet_grad_matches_autodiff():
    W = _well_conditioned(jax.random.PRNGKey(2), 16, 12)
    g_ours = jax.grad(lambda w: jnp.sum(linalg.logabsdet(w)))(W)
    g_ref = jax.grad(lambda w: jnp.sum(jnp.linalg.slogdet(w)[1]))(W)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [2, 3, 12])
def test_inv_matches_jnp(n):
    W = _well_conditioned(jax.random.PRNGKey(3), 64, n)
    np.testing.assert_allclose(np.asarray(linalg.inv(W)),
                               np.asarray(jnp.linalg.inv(W)),
                               rtol=1e-4, atol=1e-5)


def test_inv_grad_matches_autodiff():
    W = _well_conditioned(jax.random.PRNGKey(4), 8, 6)
    t = jax.random.normal(jax.random.PRNGKey(5), W.shape)
    g_ours = jax.grad(lambda w: jnp.sum(linalg.inv(w) * t))(W)
    g_ref = jax.grad(lambda w: jnp.sum(jnp.linalg.inv(w) * t))(W)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pivoting_handles_zero_leading_entry():
    # leading principal entry zero: naive (unpivoted) elimination would NaN
    W = jnp.array([[[0.0, 1.0], [1.0, 0.5]]])
    np.testing.assert_allclose(float(linalg.logabsdet(W)[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(linalg.inv(W)[0]),
                               np.asarray(jnp.linalg.inv(W)[0]),
                               rtol=1e-6, atol=1e-6)
