"""Pallas streaming-Sinkhorn kernels vs the dense reference path.

Runs in interpreter mode on CPU (the kernels compile for real on TPU; the
math is identical either way)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfdpf_tpu.ops.pallas.sinkhorn_pallas as sp
from nfdpf_tpu.ops.sinkhorn import (
    cost,
    ot_resample,
    softmin,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(sp, "_INTERPRET", True)


def _cloud(key, b=2, n=40, d=2):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (b, n, d)) * 3.0
    probs = jax.nn.softmax(jax.random.normal(k2, (b, n)))
    return x, probs


def test_streaming_softmin_matches_dense():
    x, probs = _cloud(jax.random.PRNGKey(0))
    f = jnp.log(probs)
    eps = jnp.full((2,), 0.37)
    dense = softmin(eps, cost(x, x), f)
    streamed = sp.streaming_softmin(eps, x, x, f)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_streaming_softmin_nondivisible_sizes():
    """Padding path: N=37 not a multiple of any block size."""
    x, probs = _cloud(jax.random.PRNGKey(1), b=3, n=37)
    f = jnp.log(probs)
    eps = jnp.full((3,), 1.3)
    dense = softmin(eps, cost(x, x), f)
    streamed = sp.streaming_softmin(eps, x, x, f)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_streaming_transport_apply_matches_dense():
    x, probs = _cloud(jax.random.PRNGKey(2), b=2, n=24)
    eps = jnp.full((2,), 0.5)
    f = jax.random.normal(jax.random.PRNGKey(3), (2, 24)) * 0.1
    c_weights = jax.random.normal(jax.random.PRNGKey(4), (2, 24)) * 0.1
    v = jax.random.normal(jax.random.PRNGKey(5), (2, 24, 2))

    # dense T_ij = exp(r_i + c_j − C_ij/ε)
    cmat = cost(x, x)
    t = jnp.exp(f[:, :, None] + c_weights[:, None, :]
                - cmat / eps[:, None, None])
    dense = jnp.einsum("bij,bjd->bid", t, v)
    streamed = sp.streaming_transport_apply(v, eps, x, f, c_weights)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_streaming_transport_apply_vjp():
    """Backward must be Tᵀ @ g and zero for non-value inputs."""
    x, probs = _cloud(jax.random.PRNGKey(6), b=1, n=16)
    eps = jnp.full((1,), 0.8)
    f = jax.random.normal(jax.random.PRNGKey(7), (1, 16)) * 0.1
    cw = jax.random.normal(jax.random.PRNGKey(8), (1, 16)) * 0.1
    v = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 2))

    def loss(values):
        return jnp.sum(sp.streaming_transport_apply(values, eps, x, f, cw) ** 2)

    g_auto = jax.grad(loss)(v)
    # dense check
    cmat = cost(x, x)
    t = jnp.exp(f[:, :, None] + cw[:, None, :] - cmat / eps[:, None, None])
    out = jnp.einsum("bij,bjd->bid", t, v)
    g_dense = 2 * jnp.einsum("bij,bid->bjd", t, out)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-4)


def test_ot_resample_pallas_matches_dense():
    x, probs = _cloud(jax.random.PRNGKey(10), b=2, n=32)
    p_dense, w_dense, _ = ot_resample(
        x, probs, eps=0.1, scaling=0.9, threshold=1e-4, max_iter=200,
        convergence="any",
    )
    p_pallas, w_pallas, idx = sp.ot_resample_pallas(
        x, probs, eps=0.1, scaling=0.9, threshold=1e-4, max_iter=200,
        convergence="any",
    )
    np.testing.assert_allclose(np.asarray(p_pallas), np.asarray(p_dense),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(w_pallas), np.asarray(w_dense))
    assert np.array_equal(np.asarray(idx[0]), np.arange(32))


def test_ot_resample_pallas_gradient_topology():
    x, probs = _cloud(jax.random.PRNGKey(11), b=1, n=16)

    def loss_p(p):
        out, _, _ = sp.ot_resample_pallas(p, probs, max_iter=10)
        return jnp.sum(out**2)

    def loss_w(w):
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        out, _, _ = sp.ot_resample_pallas(x, w, max_iter=10)
        return jnp.sum(out**2)

    g_p = jax.grad(loss_p)(x)
    g_w = jax.grad(loss_w)(probs)
    assert float(jnp.sum(jnp.abs(g_p))) > 0
    np.testing.assert_allclose(np.asarray(g_w), 0.0, atol=1e-7)


def test_ot_resample_pallas_particle_sharded_matches_unsharded():
    """VERDICT r2 #4: the streaming kernel must run with the PARTICLE axis
    sharded — same outputs, same gradient, no dense fallback."""
    import pytest
    from jax.sharding import Mesh, PartitionSpec as P

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    x, probs = _cloud(jax.random.PRNGKey(12), b=2, n=64)
    kw = dict(eps=0.1, scaling=0.9, threshold=1e-4, max_iter=200,
              convergence="any")
    ref_p, ref_w, _ = sp.ot_resample_pallas(x, probs, **kw)

    mesh = Mesh(np.array(jax.devices()[:4]), ("particle",))
    fn = jax.shard_map(
        lambda p, w: sp.ot_resample_pallas_sharded(
            p, w, particle_axis="particle", **kw),
        mesh=mesh,
        in_specs=(P(None, "particle", None), P(None, "particle")),
        out_specs=(P(None, "particle", None), P(None, "particle"),
                   P(None, "particle")),
        check_vma=False,
    )
    out_p, out_w, idx = jax.jit(fn)(x, probs)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w))
    assert np.array_equal(np.asarray(idx[0]), np.arange(64))

    # gradient parity: value-path gradient survives the sharded transport
    g_ref = jax.grad(lambda p: jnp.sum(
        sp.ot_resample_pallas(p, probs, **kw)[0] ** 2))(x)
    g_sh = jax.grad(lambda p: jnp.sum(jax.jit(fn)(p, probs)[0] ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_warm_start_invalid_flag_is_identity():
    """warm_start with valid=False must reproduce the cold path bit-exactly
    (first ESS-gate firing in a warm-start run)."""
    x, probs = _cloud(jax.random.PRNGKey(5))
    kw = dict(eps=0.1, scaling=0.75, threshold=1e-3, max_iter=100)
    cold = sp.ot_resample_pallas(x, probs, **kw)
    warm = sp.ot_resample_pallas(
        x, probs, **kw,
        warm_start=(jnp.zeros((2, 2, 40)), jnp.asarray(False)),
        return_extras=True,
    )
    np.testing.assert_array_equal(np.asarray(warm[0]), np.asarray(cold[0]))
    assert warm[3]["potentials"].shape == (2, 2, 40)
    assert int(warm[3]["iters"]) > 0


def test_warm_start_same_fixed_point_fewer_iters():
    """Warm-starting from the previous firing's potentials reaches the same
    threshold-converged transport with strictly fewer loop iterations —
    the config-5 cost lever's contract (annealing loop detached, so only
    iteration count may change)."""
    x, probs = _cloud(jax.random.PRNGKey(6))
    kw = dict(eps=0.1, scaling=0.75, threshold=1e-3, max_iter=100)
    p_cold, w_cold, _, ex_cold = sp.ot_resample_pallas(
        x, probs, **kw, return_extras=True)

    # particles drift a little between firings (a few motion steps)
    key = jax.random.PRNGKey(7)
    x2 = x + 0.05 * jax.random.normal(key, x.shape)
    probs2 = jax.nn.softmax(jnp.log(probs) * 1.1)

    p_cold2, _, _, ex_cold2 = sp.ot_resample_pallas(
        x2, probs2, **kw, return_extras=True)
    p_warm2, _, _, ex_warm2 = sp.ot_resample_pallas(
        x2, probs2, **kw,
        warm_start=(ex_cold["potentials"], jnp.asarray(True)),
        return_extras=True,
    )
    # same fixed point within convergence slack (|Δpot| ≤ threshold stops
    # the loop, not distance-to-fixed-point; measured gap at thr=1e-3 is
    # ~3% of the particle scale and shrinks 10× at thr=1e-4 — see below)
    np.testing.assert_allclose(np.asarray(p_warm2), np.asarray(p_cold2),
                               rtol=5e-2, atol=0.35)
    assert int(ex_warm2["iters"]) < int(ex_cold2["iters"])

    # tightening the threshold shrinks the warm/cold gap: both trajectories
    # approach the SAME fixed point, differing only in where they stop
    kw_tight = dict(eps=0.1, scaling=0.75, threshold=1e-4, max_iter=200)
    p_ct, _, _, ex_ct = sp.ot_resample_pallas(
        x2, probs2, **kw_tight, return_extras=True)
    p_wt, _, _, ex_wt = sp.ot_resample_pallas(
        x2, probs2, **kw_tight,
        warm_start=(ex_cold["potentials"], jnp.asarray(True)),
        return_extras=True,
    )
    assert float(np.max(np.abs(np.asarray(p_wt) - np.asarray(p_ct)))) < 0.05
    assert int(ex_wt["iters"]) < int(ex_ct["iters"])


def test_warm_start_gradient_topology_unchanged():
    """Gradient flows only through the T@x value operand, warm or cold."""
    x, probs = _cloud(jax.random.PRNGKey(8))
    kw = dict(eps=0.1, scaling=0.75, threshold=1e-3, max_iter=100)
    _, _, _, ex = sp.ot_resample_pallas(x, probs, **kw, return_extras=True)

    def loss_warm(p):
        out = sp.ot_resample_pallas(
            p, probs, **kw,
            warm_start=(ex["potentials"], jnp.asarray(True)))
        return jnp.sum(out[0] ** 2)

    def loss_cold(p):
        return jnp.sum(sp.ot_resample_pallas(p, probs, **kw)[0] ** 2)

    g_warm = jax.grad(loss_warm)(x)
    g_cold = jax.grad(loss_cold)(x)
    assert np.all(np.isfinite(np.asarray(g_warm)))
    # same topology, nearly identical values (potentials differ only within
    # the convergence threshold)
    np.testing.assert_allclose(np.asarray(g_warm), np.asarray(g_cold),
                               rtol=5e-2, atol=5e-3)


def test_warm_start_sharded_matches_unsharded():
    """Sharded warm start: the potentials carry is sharded like the
    particles, and warm/cold behave exactly as the unsharded kernel."""
    import pytest
    from jax.sharding import Mesh, PartitionSpec as P

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    x, probs = _cloud(jax.random.PRNGKey(20), b=2, n=64)
    kw = dict(eps=0.1, scaling=0.75, threshold=1e-3, max_iter=100)

    ref_p, _, _, ref_ex = sp.ot_resample_pallas(
        x, probs, **kw, return_extras=True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("particle",))
    pot_spec = P(None, None, "particle")
    fn = jax.shard_map(
        lambda p, w, po, v: sp.ot_resample_pallas_sharded(
            p, w, particle_axis="particle", warm_start=(po, v),
            return_extras=True, **kw),
        mesh=mesh,
        in_specs=(P(None, "particle", None), P(None, "particle"),
                  pot_spec, P()),
        out_specs=(P(None, "particle", None), P(None, "particle"),
                   P(None, "particle"),
                   {"potentials": pot_spec, "iters": P()}),
        check_vma=False,
    )
    # cold (invalid warm flag) must match the unsharded kernel
    zeros = jnp.zeros((2, 2, 64))
    p_cold, _, _, ex_cold = jax.jit(fn)(x, probs, zeros,
                                        jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(p_cold), np.asarray(ref_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ex_cold["potentials"]),
                               np.asarray(ref_ex["potentials"]),
                               rtol=1e-4, atol=1e-5)
    assert int(ex_cold["iters"]) == int(ref_ex["iters"])

    # warm from the previous firing's (sharded) potentials: fewer iters,
    # matching the unsharded warm kernel's output
    x2 = x + 0.05 * jax.random.normal(jax.random.PRNGKey(21), x.shape)
    p_wu, _, _, ex_wu = sp.ot_resample_pallas(
        x2, probs, **kw, warm_start=(ref_ex["potentials"],
                                     jnp.asarray(True)),
        return_extras=True)
    p_ws, _, _, ex_ws = jax.jit(fn)(x2, probs, ex_cold["potentials"],
                                    jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(p_ws), np.asarray(p_wu),
                               rtol=1e-4, atol=1e-5)
    assert int(ex_ws["iters"]) == int(ex_wu["iters"])
