"""Golden-value parity against the actual PyTorch reference implementation.

These tests import the reference code from /root/reference (read-only),
load OUR initialised parameters into ITS modules, and assert numerical
agreement.  This pins the rebuild to the reference's exact semantics far
more tightly than structural tests can.

Covered: RealNVP (cond + uncond) forward/inverse, flow composers, RQS
splines, Sinkhorn transport matrices, weight normalisation, the prototype
density, and cosine distance.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from nfdpf_tpu.ops import density  # noqa: E402
from nfdpf_tpu.ops import flows as jflows  # noqa: E402
from nfdpf_tpu.ops import rqs as jrqs  # noqa: E402
from nfdpf_tpu.ops.sinkhorn import sinkhorn_transport  # noqa: E402


def _copy_fcnn_to_torch(torch_fcnn, flax_params):
    """Load a flax FCNN param subtree into the reference FCNN (nf/flows.py:101)."""
    linears = [m for m in torch_fcnn.network if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(linears):
        dense = flax_params[f"Dense_{i}"]
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(dense["kernel"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(dense["bias"])))


@pytest.mark.parametrize("ctx_dim", [0, 4])
def test_realnvp_matches_reference(ctx_dim):
    from nf.flows import RealNVP, RealNVP_cond

    dim = 2
    m = jflows.AffineCoupling(dim=dim, hidden_dim=8, init_std=0.3)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, dim))
    ctx = (jax.random.normal(jax.random.PRNGKey(1), (16, ctx_dim))
           if ctx_dim else None)
    params = m.init(key, x, ctx)["params"]

    if ctx_dim:
        ref = RealNVP_cond(dim=dim, hidden_dim=8, obser_dim=ctx_dim)
    else:
        ref = RealNVP(dim=dim, hidden_dim=8)
    for name in ("t1", "s1", "t2", "s2"):
        _copy_fcnn_to_torch(getattr(ref, name), params[name])

    tx = torch.tensor(np.asarray(x))
    targs = (tx,) if ctx is None else (tx, torch.tensor(np.asarray(ctx)))
    with torch.no_grad():
        z_ref, ld_ref = ref.forward(*targs)
    z, ld = jflows.AffineCoupling(dim=dim, hidden_dim=8).apply(
        {"params": params}, x, ctx, method=jflows.AffineCoupling.forward
    )
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-5,
                               atol=1e-6)

    with torch.no_grad():
        x_ref, ldi_ref = ref.inverse(*targs)
    xi, ldi = jflows.AffineCoupling(dim=dim, hidden_dim=8).apply(
        {"params": params}, x, ctx, method=jflows.AffineCoupling.inverse
    )
    np.testing.assert_allclose(np.asarray(xi), x_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldi), ldi_ref.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_flow_composer_matches_reference():
    """Two-block conditional chain vs NormalizingFlowModel_cond
    (`nf/models.py:37-66`), incl. the MVN prior log-prob."""
    from nf.flows import RealNVP_cond
    from nf.models import NormalizingFlowModel_cond
    from torch.distributions import MultivariateNormal

    dim, ctx_dim, std = 2, 4, 2.5
    chain = jflows.realnvp_chain(2, dim, 8, init_std=0.3, prior_std=std)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (8, dim))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (8, ctx_dim))
    variables = chain.init(key, x, ctx)

    ref_flows = [RealNVP_cond(dim=dim, hidden_dim=8, obser_dim=ctx_dim)
                 for _ in range(2)]
    for i, rf in enumerate(ref_flows):
        sub = variables["params"][f"flows_{i}"]
        for name in ("t1", "s1", "t2", "s2"):
            _copy_fcnn_to_torch(getattr(rf, name), sub[name])
    prior = MultivariateNormal(torch.zeros(dim), torch.eye(dim) * std**2)
    ref = NormalizingFlowModel_cond(prior, ref_flows, device="cpu")

    with torch.no_grad():
        z_ref, plp_ref, ld_ref = ref.forward(
            torch.tensor(np.asarray(x)), torch.tensor(np.asarray(ctx))
        )
    z, plp, ld = chain.apply(variables, x, ctx, method=chain.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(plp), plp_ref.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-5,
                               atol=1e-6)

    with torch.no_grad():
        xi_ref, ldi_ref = ref.inverse(
            torch.tensor(np.asarray(x)), torch.tensor(np.asarray(ctx))
        )
    xi, ldi = chain.apply(variables, x, ctx, method=chain.inverse)
    np.testing.assert_allclose(np.asarray(xi), xi_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldi), ldi_ref.numpy(), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("inverse", [False, True])
def test_rqs_matches_reference(inverse):
    from nf.utils import unconstrained_RQS as ref_rqs

    rng = np.random.default_rng(0)
    n, k = 32, 5
    inputs = rng.uniform(-4, 4, n).astype(np.float32)   # some outside ±3
    w = rng.normal(size=(n, k)).astype(np.float32)
    h = rng.normal(size=(n, k)).astype(np.float32)
    d = rng.normal(size=(n, k - 1)).astype(np.float32)

    out_ref, ld_ref = ref_rqs(
        torch.tensor(inputs), torch.tensor(w), torch.tensor(h),
        torch.tensor(d), inverse=inverse, tail_bound=3.0,
    )
    out, ld = jrqs.unconstrained_rqs(
        jnp.asarray(inputs), jnp.asarray(w), jnp.asarray(h), jnp.asarray(d),
        inverse=inverse, tail_bound=3.0,
    )
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_sinkhorn_transport_matches_reference():
    """Transport matrices vs `resamplers.py:211-227` on identical inputs."""
    from resamplers.resamplers import transport_function

    rng = np.random.default_rng(1)
    b, n, d = 2, 32, 2
    x = rng.normal(size=(b, n, d)).astype(np.float32) * 5
    logits = rng.normal(size=(b, n)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    logw = np.log(probs)

    t_ref = transport_function(
        torch.tensor(x), torch.tensor(logw), eps=0.1, scaling=0.75,
        threshold=1e-3, max_iter=100, n=n, device="cpu",
    ).detach().numpy()

    t_jax = np.asarray(sinkhorn_transport(
        jnp.asarray(x), jnp.asarray(logw), eps=0.1, scaling=0.75,
        threshold=1e-3, max_iter=100, convergence="all",
    ))
    # while-loop iteration counts can differ by ±1 from fp noise in the
    # convergence test; compare with modest tolerance plus tight marginals.
    np.testing.assert_allclose(t_jax, t_ref, rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(t_jax.sum(axis=1), t_ref.sum(axis=1),
                               rtol=1e-3)


def test_weight_utils_match_reference():
    from utils import compute_normal_density, et_distance, normalize_log_probs

    rng = np.random.default_rng(2)
    logw = rng.normal(size=(4, 50)).astype(np.float32) * 10
    ours = np.asarray(density.normalize_log_weights(jnp.asarray(logw)))
    theirs = normalize_log_probs(torch.tensor(logw)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)

    noise = rng.normal(size=(4, 50, 2)).astype(np.float32) * 20
    ours_d = np.asarray(density.log_normal_density(jnp.asarray(noise), 20.0, 20.0))
    proto = compute_normal_density(pos_noise=20.0, vel_noise=20.0)
    theirs_d = proto(torch.tensor(noise)).numpy()
    np.testing.assert_allclose(ours_d, theirs_d, rtol=1e-5, atol=1e-5)

    a = rng.normal(size=(4, 50, 32)).astype(np.float32)
    c = rng.normal(size=(4, 50, 32)).astype(np.float32)
    ours_e = np.asarray(density.cosine_distance(jnp.asarray(a), jnp.asarray(c)))
    theirs_e = et_distance(torch.tensor(a), torch.tensor(c)).numpy()
    np.testing.assert_allclose(ours_e, theirs_e, rtol=1e-5, atol=1e-6)


def test_soft_resampler_q_distribution_matches_reference():
    """The deterministic parts of soft resampling (q construction, importance
    correction) vs `resamplers.py:29-38` — sampling uses different RNG so
    only the distributional machinery is compared."""
    rng = np.random.default_rng(3)
    b, n = 3, 64
    logits = rng.normal(size=(b, n)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    alpha = 0.5
    # reference computation
    uniform = np.ones((b, n), np.float32) / n
    q_ref = alpha * probs + (1 - alpha) * uniform
    q_ref = q_ref / q_ref.sum(-1, keepdims=True)
    corrected_ref = probs / q_ref
    # ours (via the public function with a pinned index permutation)
    from nfdpf_tpu.ops.resampling import soft_systematic_resample

    particles = jnp.asarray(rng.normal(size=(b, n, 2)).astype(np.float32))
    _, w, idx = soft_systematic_resample(
        jax.random.PRNGKey(0), particles, jnp.asarray(probs), alpha
    )
    gathered = np.take_along_axis(corrected_ref, np.asarray(idx), axis=1)
    expected = gathered / gathered.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(w), expected, rtol=1e-5)


def _copy_particle_encoder_to_torch(torch_seq, flax_params):
    """Load our ParticleEncoder params into the reference's MLP
    (`model/models.py:130-139`)."""
    linears = [m for m in torch_seq if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(linears):
        dense = flax_params[f"Dense_{i}"]
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(dense["kernel"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(dense["bias"])))


def test_cosine_measurement_matches_reference():
    from model.models import build_particle_encoder, measurement_model_cosine_distance

    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.models.measurement import build_measurement_model

    cfg = DPFConfig(measurement="cos")
    ours = build_measurement_model(cfg)
    key = jax.random.PRNGKey(0)
    enc = jax.random.normal(key, (3, 32))
    particles = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 2)) * 10
    variables = ours.init(key, enc, particles)

    ref_pe = build_particle_encoder(32, 2)
    _copy_particle_encoder_to_torch(
        ref_pe, variables["params"]["particle_encoder"]
    )
    ref = measurement_model_cosine_distance(ref_pe)
    with torch.no_grad():
        lik_ref = ref(torch.tensor(np.asarray(enc)),
                      torch.tensor(np.asarray(particles)))
    lik = ours.apply(variables, enc, particles)
    np.testing.assert_allclose(np.asarray(lik), lik_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_gaussian_measurement_matches_reference():
    from model.models import build_particle_encoder, measurement_model_Gaussian
    from torch.distributions import MultivariateNormal

    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.models.measurement import build_measurement_model

    cfg = DPFConfig(measurement="gaussian")
    ours = build_measurement_model(cfg)
    key = jax.random.PRNGKey(2)
    enc = jax.random.normal(key, (2, 32))
    particles = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 2)) * 10
    variables = ours.init(key, enc, particles)

    ref_pe = build_particle_encoder(32, 2)
    _copy_particle_encoder_to_torch(
        ref_pe, variables["params"]["particle_encoder"]
    )
    dist = MultivariateNormal(torch.ones(32), 100 * torch.eye(32))
    ref = measurement_model_Gaussian(ref_pe, dist)
    with torch.no_grad():
        lik_ref = ref(torch.tensor(np.asarray(enc)),
                      torch.tensor(np.asarray(particles)))
    lik = ours.apply(variables, enc, particles)
    np.testing.assert_allclose(np.asarray(lik), lik_ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_crnvp_measurement_matches_reference():
    from model.models import build_particle_encoder, measurement_model_cnf
    from nf.flows import RealNVP_cond
    from nf.models import NormalizingFlowModel_cond
    from torch.distributions import MultivariateNormal

    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.models.measurement import build_measurement_model

    cfg = DPFConfig(measurement="CRNVP")
    ours = build_measurement_model(cfg)
    key = jax.random.PRNGKey(4)
    enc = jax.random.normal(key, (2, 32))
    particles = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 2)) * 10
    variables = ours.init(key, enc, particles)

    ref_pe = build_particle_encoder(32, 2)
    _copy_particle_encoder_to_torch(
        ref_pe, variables["params"]["particle_encoder"]
    )
    flows = [RealNVP_cond(dim=32, hidden_dim=8, obser_dim=32) for _ in range(2)]
    for i, rf in enumerate(flows):
        sub = variables["params"]["cnf"][f"flows_{i}"]
        for name in ("t1", "s1", "t2", "s2"):
            _copy_fcnn_to_torch(getattr(rf, name), sub[name])
    prior = MultivariateNormal(torch.zeros(32), torch.eye(32) * 2.5**2)
    cnf = NormalizingFlowModel_cond(prior, flows, device="cpu")
    ref = measurement_model_cnf(ref_pe, cnf)
    with torch.no_grad():
        lik_ref = ref(torch.tensor(np.asarray(enc)),
                      torch.tensor(np.asarray(particles)))
    lik = ours.apply(variables, enc, particles)
    np.testing.assert_allclose(np.asarray(lik), lik_ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_nsf_coupling_matches_reference():
    """NSF_CL forward/inverse vs the reference (`nf/flows.py:404-458`)."""
    from nf.flows import NSF_CL

    dim = 4
    m = jflows.NSFCoupling(dim=dim, K=5, B=3.0, hidden_dim=8)
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (32, dim)) * 2.0   # exercise tails and bins
    params = m.init(key, x)["params"]

    ref = NSF_CL(dim=dim, K=5, B=3, hidden_dim=8)
    _copy_fcnn_to_torch(ref.f1, params["f1"])
    _copy_fcnn_to_torch(ref.f2, params["f2"])

    tx = torch.tensor(np.asarray(x))
    with torch.no_grad():
        z_ref, ld_ref = ref.forward(tx)
    z, ld = m.apply({"params": params}, x, method=jflows.NSFCoupling.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-4,
                               atol=1e-5)

    with torch.no_grad():
        x_ref, ldi_ref = ref.inverse(tx)
    xi, ldi = m.apply({"params": params}, x, method=jflows.NSFCoupling.inverse)
    np.testing.assert_allclose(np.asarray(xi), x_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldi), ldi_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_nsf_autoregressive_matches_reference():
    """NSF_AR forward/inverse vs the reference (`nf/flows.py:347-401`).

    Our ``init_param`` stores U[0,1) and subtracts 0.5 at use time (the
    reference initialises U[-1/2,1/2) directly), so the torch copy gets
    ``ours - 0.5``.
    """
    from nf.flows import NSF_AR

    dim = 2
    m = jflows.NSFAutoregressive(dim=dim, K=5, B=3.0, hidden_dim=8)
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (32, dim)) * 2.0
    params = m.init(key, x)["params"]

    ref = NSF_AR(dim=dim, K=5, B=3, hidden_dim=8)
    with torch.no_grad():
        ref.init_param.copy_(
            torch.tensor(np.asarray(params["init_param"]) - 0.5))
    for i, layer in enumerate(ref.layers):
        _copy_fcnn_to_torch(layer, params[f"layers_{i}"])

    tx = torch.tensor(np.asarray(x))
    with torch.no_grad():
        z_ref, ld_ref = ref.forward(tx)
    z, ld = m.apply({"params": params}, x,
                    method=jflows.NSFAutoregressive.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-4,
                               atol=1e-5)

    with torch.no_grad():
        x_ref, ldi_ref = ref.inverse(tx)
    xi, ldi = m.apply({"params": params}, x,
                      method=jflows.NSFAutoregressive.inverse)
    np.testing.assert_allclose(np.asarray(xi), x_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldi), ldi_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_maf_matches_reference():
    """MAF forward/inverse vs the reference (`nf/flows.py:241-284`).

    Our ``initial_param`` stores U[0, 2√.5) and subtracts √.5 at use time."""
    import math

    from nf.flows import MAF as RefMAF

    dim = 2
    m = jflows.MAF(dim=dim, hidden_dim=8)
    key = jax.random.PRNGKey(17)
    x = jax.random.normal(key, (16, dim))
    params = m.init(key, x)["params"]

    ref = RefMAF(dim=dim, hidden_dim=8)
    with torch.no_grad():
        ref.initial_param.copy_(torch.tensor(
            np.asarray(params["initial_param"]) - math.sqrt(0.5)))
    for i, layer in enumerate(ref.layers):
        _copy_fcnn_to_torch(layer, params[f"layers_{i}"])

    tx = torch.tensor(np.asarray(x))
    with torch.no_grad():
        z_ref, ld_ref = ref.forward(tx)
    z, ld = m.apply({"params": params}, x, method=jflows.MAF.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-5,
                               atol=1e-6)

    with torch.no_grad():
        x_ref, ldi_ref = ref.inverse(tx)
    xi, ldi = m.apply({"params": params}, x, method=jflows.MAF.inverse)
    np.testing.assert_allclose(np.asarray(xi), x_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldi), ldi_ref.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_actnorm_and_lu_linear_match_reference():
    """ActNorm and OneByOneConv vs the reference (`nf/flows.py:287-344`)."""
    from nf.flows import ActNorm as RefActNorm
    from nf.flows import OneByOneConv as RefConv

    dim = 2
    key = jax.random.PRNGKey(19)
    x = jax.random.normal(key, (16, dim))

    # --- ActNorm (randomised params, reference inits to zeros) ---
    m = jflows.ActNorm(dim=dim)
    params = {
        "mu": jax.random.normal(jax.random.PRNGKey(1), (dim,)),
        "log_sigma": 0.3 * jax.random.normal(jax.random.PRNGKey(2), (dim,)),
    }
    ref = RefActNorm(dim)
    with torch.no_grad():
        ref.mu.copy_(torch.tensor(np.asarray(params["mu"])))
        ref.log_sigma.copy_(torch.tensor(np.asarray(params["log_sigma"])))
    tx = torch.tensor(np.asarray(x))
    with torch.no_grad():
        z_ref, ld_ref = ref.forward(tx)
    z, ld = m.apply({"params": params}, x, method=jflows.ActNorm.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ld)[0], float(ld_ref), rtol=1e-6)
    with torch.no_grad():
        xr, ldi_ref = ref.inverse(tx)
    xi, ldi = m.apply({"params": params}, x, method=jflows.ActNorm.inverse)
    np.testing.assert_allclose(np.asarray(xi), xr.numpy(), rtol=1e-6)

    # --- OneByOneConv / InvertibleLinear (copy OUR LU factors into torch) ---
    lin = jflows.InvertibleLinear(dim=dim)
    variables = lin.init(jax.random.PRNGKey(3), x)
    p = variables["params"]
    ref_c = RefConv(dim)
    with torch.no_grad():
        ref_c.P = torch.tensor(np.asarray(variables["constants"]["P"]))
        ref_c.L.copy_(torch.tensor(np.asarray(p["L"])))
        ref_c.S.copy_(torch.tensor(np.asarray(p["S"])))
        ref_c.U.copy_(torch.tensor(np.asarray(p["U"])))
    with torch.no_grad():
        z_ref, ld_ref = ref_c.forward(tx)
    z, ld = lin.apply(variables, x, method=jflows.InvertibleLinear.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld)[0], float(ld_ref), rtol=1e-5)
    with torch.no_grad():
        x_ref, _ = ref_c.inverse(tx)
    xi, _ = lin.apply(variables, x, method=jflows.InvertibleLinear.inverse)
    np.testing.assert_allclose(np.asarray(xi), x_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_planar_and_radial_match_reference():
    """Planar vs reference; Radial at batch=1 where the reference's global
    norm (`nf/flows.py:91`) coincides with the per-sample radius."""
    import math

    from nf.flows import Planar as RefPlanar
    from nf.flows import Radial as RefRadial

    dim = 2
    bound = math.sqrt(1.0 / dim)
    key = jax.random.PRNGKey(23)
    x = jax.random.normal(key, (16, dim))

    m = jflows.Planar(dim=dim)
    params = m.init(key, x)["params"]
    ref = RefPlanar(dim)
    with torch.no_grad():
        ref.w.copy_(torch.tensor(np.asarray(params["w"]) - bound))
        ref.u.copy_(torch.tensor(np.asarray(params["u"]) - bound))
        ref.b.copy_(torch.tensor(np.asarray(params["b"]) - bound))
    tx = torch.tensor(np.asarray(x))
    with torch.no_grad():
        z_ref, ld_ref = ref.forward(tx)
    z, ld = m.apply({"params": params}, x, method=jflows.Planar.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-4,
                               atol=1e-6)

    x1 = x[:1]
    mr = jflows.Radial(dim=dim)
    rparams = mr.init(key, x1)["params"]
    ref_r = RefRadial(dim)
    with torch.no_grad():
        ref_r.x0.copy_(torch.tensor(np.asarray(rparams["x0"]) - bound))
        ref_r.log_alpha.copy_(
            torch.tensor(np.asarray(rparams["log_alpha"]) - bound))
        ref_r.beta.copy_(torch.tensor(np.asarray(rparams["beta"]) - bound))
    with torch.no_grad():
        z_ref, ld_ref = ref_r.forward(torch.tensor(np.asarray(x1)))
    z, ld = mr.apply({"params": rparams}, x1, method=jflows.Radial.forward)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy()[:1], rtol=1e-4,
                               atol=1e-5)
