"""Loss functions, incl. brute-force cross-check of the pseudo-likelihood
ancestor walk against a direct reimplementation of the reference algorithm
(`/root/reference/losses.py:37-106` semantics, flat-index gathers)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from nfdpf_tpu import losses as L


def test_supervised_loss_train_eval():
    key = jax.random.PRNGKey(0)
    b, t, n = 2, 4, 8
    particles = jax.random.normal(key, (b, t, n, 2))
    weights = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (b, t, n)))
    state = jax.random.normal(jax.random.PRNGKey(2), (b, t, 4))
    loss_eval, pred = L.supervised_loss(particles, weights, state, 1.0, False)
    assert pred.shape == (b, t, 2)
    expect = np.sqrt(np.mean(
        (np.asarray(pred) - np.asarray(state)[..., :2]) ** 2))
    np.testing.assert_allclose(float(loss_eval), expect, rtol=1e-6)
    # train with full mask and ratio 1.0 == eval loss
    mask = jnp.ones((b, t))
    loss_train, _ = L.supervised_loss(particles, weights, state, mask, True, 1.0)
    np.testing.assert_allclose(float(loss_train), expect, rtol=1e-6)


def test_semi_supervised_mask_exact_count():
    mask = L.semi_supervised_mask(jax.random.PRNGKey(0), 8, 10, 0.25)
    assert mask.shape == (8, 10)
    assert int(mask.sum()) == int(8 * 10 * 0.25)


def _reference_walk_numpy(weights, noise, lik, idx_flat, block_len,
                          std_pos, std_vel, priors=None):
    """Direct numpy port of the reference ancestor walk (flat indices,
    `losses.py:47-66,82-103`), incl. the never-reset logyita quirk."""
    b_sz, t, n = weights.shape
    log_c = -0.5 * math.log(2 * math.pi)
    q = np.zeros(b_sz)
    logyita = np.zeros((b_sz, n))
    blocks = 0
    for k in range(t):
        if (k + 1) % block_len != 0:
            continue
        for j in range(k, k - block_len, -1):
            if j == k:
                lik_j = lik[:, j, :]
                index_a = idx_flat[:, j, :]
                if priors is None:
                    npos = noise[:, j, :, :2]
                else:
                    prior_j = priors[:, j, :]
            else:
                lik_j = lik[:, j, :].reshape(b_sz * n)[index_a]
                if priors is None:
                    npos = noise[:, j, :, :2].reshape(b_sz * n, -1)[index_a, :]
                else:
                    prior_j = priors[:, j, :].reshape(b_sz * n)[index_a]
                index_a = idx_flat[:, j, :].reshape(b_sz * n)[index_a]
            if priors is None:
                prior_j = (
                    2 * log_c - 2 * math.log(std_pos)
                    - np.sum(npos**2 / (2 * std_pos**2), axis=-1)
                ) + (2 * log_c - 2 * math.log(std_vel))
            logyita = logyita + prior_j + lik_j
        q += np.sum(weights[:, k, :] * logyita, axis=-1)
        blocks += 1
    return q / blocks


def _random_histories(key, b=2, t=20, n=8):
    ks = jax.random.split(key, 5)
    weights = jax.nn.softmax(jax.random.normal(ks[0], (b, t, n)))
    noise = jax.random.normal(ks[1], (b, t, n, 2)) * 2
    lik = jax.random.normal(ks[2], (b, t, n))
    idx = jax.random.randint(ks[3], (b, t, n), 0, n)
    priors = jax.random.normal(ks[4], (b, t, n))
    return weights, noise, lik, idx, priors


def _to_flat(idx):
    b, t, n = idx.shape
    return np.asarray(idx) + (np.arange(b) * n)[:, None, None]


def test_pseudolikelihood_gaussian_matches_reference_walk():
    weights, noise, lik, idx, _ = _random_histories(jax.random.PRNGKey(3))
    got = float(L.pseudolikelihood_loss(weights, noise, lik, idx,
                                        block_len=5, std_pos=2.0, std_vel=3.0))
    q_ref = _reference_walk_numpy(
        np.asarray(weights), np.asarray(noise), np.asarray(lik),
        _to_flat(idx), 5, 2.0, 3.0,
    )
    np.testing.assert_allclose(got, -np.mean(q_ref), rtol=1e-5)


def test_pseudolikelihood_nf_matches_reference_walk():
    weights, noise, lik, idx, priors = _random_histories(jax.random.PRNGKey(4))
    jac = jnp.zeros_like(lik)
    got = float(L.pseudolikelihood_loss_nf(weights, noise, lik, idx, jac,
                                           priors, block_len=10))
    q_ref = _reference_walk_numpy(
        np.asarray(weights), np.asarray(noise), np.asarray(lik),
        _to_flat(idx), 10, 1.0, 1.0, priors=np.asarray(priors),
    )
    np.testing.assert_allclose(got, -np.mean(q_ref), rtol=1e-5)


def test_pseudolikelihood_differentiable():
    weights, noise, lik, idx, priors = _random_histories(jax.random.PRNGKey(5))

    def f(lik_):
        return L.pseudolikelihood_loss(weights, noise, lik_, idx, block_len=5,
                                       std_pos=2.0, std_vel=2.0)

    g = jax.grad(f)(lik)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0
