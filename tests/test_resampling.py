"""Resampler invariants (SURVEY.md §4 test strategy).

Soft resampler: index validity, unbiasedness of the weighted estimate,
importance-correction identity.  OT resampler: transport-matrix marginals,
ESS restoration, gradient-topology checks mirroring the reference's
stop-gradient choices (`resamplers/resamplers.py:234-245`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpf_tpu.ops import density
from nfdpf_tpu.ops.resampling import soft_systematic_resample, systematic_indices
from nfdpf_tpu.ops.sinkhorn import ot_resample, sinkhorn_transport


def _random_weighted_particles(key, batch=4, n=64, d=2):
    k1, k2 = jax.random.split(key)
    particles = jax.random.normal(k1, (batch, n, d)) * 3.0
    logits = jax.random.normal(k2, (batch, n))
    probs = jax.nn.softmax(logits, axis=-1)
    return particles, probs


def test_systematic_indices_valid_and_proportional():
    key = jax.random.PRNGKey(0)
    particles, probs = _random_weighted_particles(key, batch=2, n=128)
    idx = systematic_indices(jax.random.PRNGKey(1), probs)
    assert idx.shape == probs.shape
    assert int(idx.min()) >= 0 and int(idx.max()) < 128
    # systematic sampling: counts of index i ∈ {floor(N·w_i), ceil(N·w_i)}
    n = probs.shape[1]
    for b in range(2):
        counts = np.bincount(np.asarray(idx[b]), minlength=n)
        expected = np.asarray(probs[b]) * n
        assert np.all(counts >= np.floor(expected) - 1e-6)
        assert np.all(counts <= np.ceil(expected) + 1e-6)


def test_soft_resample_importance_correction():
    """After soft resampling, E[Σ w'_i f(x'_i)] == Σ w_i f(x_i)."""
    key = jax.random.PRNGKey(2)
    particles, probs = _random_weighted_particles(key, batch=1, n=256)
    target = np.asarray(density.weighted_mean(particles, probs))[0]

    means = []
    for s in range(200):
        p_r, w_r, _ = soft_systematic_resample(
            jax.random.PRNGKey(s), particles, probs, alpha=0.5
        )
        means.append(np.asarray(density.weighted_mean(p_r, w_r))[0])
    mc = np.mean(means, axis=0)
    np.testing.assert_allclose(mc, target, atol=0.15)


def test_soft_resample_alpha_one_uniform_weights():
    """alpha=1 → hard resampling: output weights uniform (`resamplers.py:35-38`)."""
    key = jax.random.PRNGKey(3)
    particles, probs = _random_weighted_particles(key)
    _, w_r, _ = soft_systematic_resample(jax.random.PRNGKey(4), particles, probs, 1.0)
    np.testing.assert_allclose(np.asarray(w_r), 1.0 / probs.shape[1], rtol=1e-5)


def test_soft_resample_gradient_flows_through_particles():
    key = jax.random.PRNGKey(5)
    particles, probs = _random_weighted_particles(key, batch=1, n=32)

    def loss(p):
        p_r, w_r, _ = soft_systematic_resample(jax.random.PRNGKey(0), p, probs, 0.5)
        return jnp.sum(density.weighted_mean(p_r, w_r) ** 2)

    g = jax.grad(loss)(particles)
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_transport_matrix_marginals():
    """T columns sum to n·w_j; rows ≈ 1 (`resamplers.py:194-210`)."""
    key = jax.random.PRNGKey(6)
    particles, probs = _random_weighted_particles(key, batch=2, n=64)
    logw = jnp.log(probs)
    t = sinkhorn_transport(particles, logw, eps=0.1, scaling=0.9,
                           threshold=1e-4, max_iter=500, convergence="any")
    n = probs.shape[1]
    col_sums = np.asarray(jnp.sum(t, axis=1))
    np.testing.assert_allclose(col_sums, n * np.asarray(probs), rtol=1e-3)
    row_sums = np.asarray(jnp.sum(t, axis=2))
    np.testing.assert_allclose(row_sums, 1.0, atol=0.05)


def test_ot_resample_preserves_mean_and_restores_ess():
    key = jax.random.PRNGKey(7)
    particles, probs = _random_weighted_particles(key, batch=2, n=64)
    p_r, w_r, idx = ot_resample(particles, probs, eps=0.1, scaling=0.9,
                                threshold=1e-4, max_iter=500, convergence="any")
    # weights uniform → ESS = N
    ess = density.effective_sample_size(w_r)
    np.testing.assert_allclose(float(ess), probs.shape[1], rtol=1e-5)
    # weighted mean preserved (transport preserves the empirical measure's mean)
    before = np.asarray(density.weighted_mean(particles, probs))
    after = np.asarray(density.weighted_mean(p_r, w_r))
    np.testing.assert_allclose(after, before, atol=0.1)
    # identity ancestor indices
    assert np.array_equal(np.asarray(idx[0]), np.arange(probs.shape[1]))


def test_ot_gradient_topology_reference_mode():
    """transport_grad=False: grad w.r.t. weights is ZERO through resampling
    (the reference discards T's gradient, `resamplers.py:245`), while grad
    w.r.t. particles flows through T@x's particle operand."""
    key = jax.random.PRNGKey(8)
    particles, probs = _random_weighted_particles(key, batch=1, n=32)

    def loss_wrt_probs(pr):
        pr = pr / jnp.sum(pr, axis=-1, keepdims=True)
        p_r, _, _ = ot_resample(particles, pr, max_iter=20)
        return jnp.sum(p_r**2)

    def loss_wrt_particles(p):
        p_r, _, _ = ot_resample(p, probs, max_iter=20)
        return jnp.sum(p_r**2)

    g_w = jax.grad(loss_wrt_probs)(probs)
    g_p = jax.grad(loss_wrt_particles)(particles)
    np.testing.assert_allclose(np.asarray(g_w), 0.0, atol=1e-7)
    assert float(jnp.sum(jnp.abs(g_p))) > 0.0


def test_ot_gradient_topology_true_otdpf_mode():
    """transport_grad=True: gradients flow through T into the weights too."""
    key = jax.random.PRNGKey(9)
    particles, probs = _random_weighted_particles(key, batch=1, n=16)

    def loss_wrt_probs(pr):
        pr = pr / jnp.sum(pr, axis=-1, keepdims=True)
        p_r, _, _ = ot_resample(particles, pr, max_iter=50, transport_grad=True)
        return jnp.sum(p_r**2)

    g_w = jax.grad(loss_wrt_probs)(probs)
    assert float(jnp.sum(jnp.abs(g_w))) > 0.0


def test_ot_resample_under_jit_and_cond():
    """OT resampling must compile inside lax.cond (ESS-gated branch)."""
    key = jax.random.PRNGKey(10)
    particles, probs = _random_weighted_particles(key, batch=2, n=32)

    @jax.jit
    def gated(p, w, do_it):
        return jax.lax.cond(
            do_it,
            lambda: ot_resample(p, w, max_iter=20)[0],
            lambda: p,
        )

    out_yes = gated(particles, probs, True)
    out_no = gated(particles, probs, False)
    assert out_yes.shape == particles.shape
    np.testing.assert_allclose(np.asarray(out_no), np.asarray(particles))
