"""Flow library invariants: forward/inverse round-trips and log-det vs autodiff.

The reference has no tests (SURVEY.md §4); these implement the test strategy
designed for the rebuild: every invertible flow must satisfy
  inverse(forward(x)) == x,  log_det_fwd + log_det_inv == 0,
and the analytic log-det must match the autodiff Jacobian determinant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpf_tpu.ops import flows as F


def _autodiff_logdet(fn, x_single):
    jac = jax.jacfwd(lambda v: fn(v[None, :])[0][0])(x_single)
    sign, ld = jnp.linalg.slogdet(jac)
    return ld


def _roundtrip_check(module, params, x, ctx=None, atol=1e-4):
    z, ld_f = module.apply(params, x, ctx, method=module.forward)
    x_rec, ld_i = module.apply(params, z, ctx, method=module.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=atol)
    return z, ld_f


@pytest.mark.parametrize("ctx_dim", [0, 4])
def test_affine_coupling_roundtrip_and_logdet(ctx_dim):
    key = jax.random.PRNGKey(0)
    dim = 2
    m = F.AffineCoupling(dim=dim, hidden_dim=8, init_std=0.5)
    x = jax.random.normal(key, (16, dim))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (16, ctx_dim)) if ctx_dim else None
    params = m.init(key, x, ctx)
    _, ld_f = _roundtrip_check(m, params, x, ctx)

    # autodiff check on a single sample
    for i in range(3):
        c_i = None if ctx is None else ctx[i : i + 1]
        fn = lambda v: m.apply(params, v, c_i, method=m.forward)  # noqa: E731
        ld_auto = _autodiff_logdet(lambda v: fn(v), x[i])
        np.testing.assert_allclose(float(ld_f[i]), float(ld_auto), atol=1e-4)


def test_affine_coupling_identity_at_zero_init():
    """zero_initialization(var≈0) → flow ≈ identity (nf/flows.py:131-153)."""
    key = jax.random.PRNGKey(0)
    m = F.AffineCoupling(dim=2, hidden_dim=8, init_std=1e-8)
    x = jax.random.normal(key, (8, 2))
    params = m.init(key, x, None)
    z, ld = m.apply(params, x, None, method=m.forward)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-5)


def test_affine_coupling_batch_polymorphism():
    """(B, N, d) inputs work without flattening (TPU-first design goal)."""
    key = jax.random.PRNGKey(0)
    m = F.AffineCoupling(dim=2, hidden_dim=8, init_std=0.1)
    x = jax.random.normal(key, (4, 5, 2))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3))
    params = m.init(key, x, ctx)
    z, ld = m.apply(params, x, ctx, method=m.forward)
    assert z.shape == (4, 5, 2) and ld.shape == (4, 5)
    # flattened gives the same result
    z2, ld2 = m.apply(params, x.reshape(20, 2), ctx.reshape(20, 3), method=m.forward)
    np.testing.assert_allclose(np.asarray(z).reshape(20, 2), np.asarray(z2), rtol=1e-6)


@pytest.mark.parametrize(
    "factory",
    [
        lambda: F.MAF(dim=2),
        lambda: F.ActNorm(dim=2),
        lambda: F.InvertibleLinear(dim=2),
        lambda: F.NSFAutoregressive(dim=2),
        lambda: F.NSFCoupling(dim=2),
    ],
    ids=["maf", "actnorm", "lu1x1", "nsf_ar", "nsf_cl"],
)
def test_flow_roundtrips(factory):
    key = jax.random.PRNGKey(2)
    m = factory()
    x = jax.random.normal(key, (16, 2))
    params = m.init(key, x, None)
    _roundtrip_check(m, params, x, None, atol=2e-4)


def test_planar_logdet_autodiff():
    key = jax.random.PRNGKey(3)
    m = F.Planar(dim=2)
    x = jax.random.normal(key, (4, 2))
    params = m.init(key, x, None)
    z, ld = m.apply(params, x, None, method=m.forward)
    for i in range(4):
        jac = jax.jacfwd(
            lambda v: m.apply(params, v[None, :], None, method=m.forward)[0][0]
        )(x[i])
        _, ld_auto = jnp.linalg.slogdet(jac)
        # planar adds +1e-4 inside the log for stability → loose tolerance
        np.testing.assert_allclose(float(ld[i]), float(ld_auto), atol=1e-3)


def test_radial_logdet_autodiff():
    key = jax.random.PRNGKey(4)
    m = F.Radial(dim=2)
    x = jax.random.normal(key, (4, 2)) * 2.0
    params = m.init(key, x, None)
    z, ld = m.apply(params, x, None, method=m.forward)
    for i in range(4):
        jac = jax.jacfwd(
            lambda v: m.apply(params, v[None, :], None, method=m.forward)[0][0]
        )(x[i])
        _, ld_auto = jnp.linalg.slogdet(jac)
        np.testing.assert_allclose(float(ld[i]), float(ld_auto), atol=1e-3)


def test_flowchain_composition_and_prior():
    key = jax.random.PRNGKey(5)
    chain = F.realnvp_chain(n_blocks=2, dim=2, init_std=0.3, prior_std=2.5)
    x = jax.random.normal(key, (16, 2))
    ctx = jax.random.normal(jax.random.PRNGKey(6), (16, 4))
    params = chain.init(key, x, ctx)
    z, prior_lp, ld = chain.apply(params, x, ctx, method=chain.forward)
    x_rec, ld_inv = chain.apply(params, z, ctx, method=chain.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)
    # prior log-prob matches scipy-style formula
    expect = (
        -0.5 * 2 * np.log(2 * np.pi)
        - 0.5 * 2 * np.log(2.5**2)
        - 0.5 * np.sum(np.asarray(z) ** 2, axis=-1) / 2.5**2
    )
    np.testing.assert_allclose(np.asarray(prior_lp), expect, rtol=1e-5)


def test_flowchain_sample_shape():
    key = jax.random.PRNGKey(7)
    chain = F.realnvp_chain(n_blocks=2, dim=2, init_std=0.1)
    x = jnp.zeros((4, 2))
    params = chain.init(key, x, None)
    samples = chain.apply(
        params, jax.random.PRNGKey(8), (4, 7), 2, None,
        method=chain.sample_with_dim,
    )
    assert samples.shape == (4, 7, 2)
