"""Golden parity of the full importance-weight bookkeeping against the
reference's `proposal_likelihood` (`/root/reference/model/models.py:358-379`)
with BOTH normalizing-flow switches on — the hardest path: conditional-NF
proposal, dynamics-flow consistency inversion, prior/propose log assembly.

Same weights loaded into both sides; the measurement model is a fixed pure
function in both so the test isolates the bookkeeping.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from nfdpf_tpu.models import dynamics as jdyn  # noqa: E402
from nfdpf_tpu.ops import flows as jflows  # noqa: E402

from tests.test_reference_parity import _copy_fcnn_to_torch  # noqa: E402


def _build_ref_chain(params, n_blocks, dim, ctx_dim, prior_std=2.5):
    from nf.flows import RealNVP_cond
    from nf.models import NormalizingFlowModel_cond
    from torch.distributions import MultivariateNormal

    flows = [RealNVP_cond(dim=dim, hidden_dim=8, obser_dim=ctx_dim)
             for _ in range(n_blocks)]
    for i, rf in enumerate(flows):
        sub = params[f"flows_{i}"]
        for name in ("t1", "s1", "t2", "s2"):
            _copy_fcnn_to_torch(getattr(rf, name), sub[name])
    prior = MultivariateNormal(torch.zeros(dim),
                               torch.eye(dim) * prior_std**2)
    return NormalizingFlowModel_cond(prior, flows, device="cpu")


@pytest.mark.parametrize("nf,nf_cond", [(True, True), (False, True),
                                        (True, False)])
def test_proposal_likelihood_matches_reference(nf, nf_cond):
    from model.models import proposal_likelihood as ref_pl
    from utils import compute_normal_density

    b, n, d, h = 3, 8, 2, 32
    pos_noise, vel_noise = 20.0, 20.0
    key = jax.random.PRNGKey(31)
    ks = jax.random.split(key, 6)

    dyn_chain = jflows.realnvp_chain(2, d, 8, init_std=0.3)
    cond_chain = jflows.realnvp_chain(2, d, 8, init_std=0.3)
    p_dummy = jnp.zeros((1, 2, d))
    dyn_vars = dyn_chain.init(ks[0], p_dummy, jnp.zeros((1, 2, 2 * d)))
    cond_vars = cond_chain.init(ks[1], p_dummy, jnp.zeros((1, 2, h + 2 * d)))

    particles_phys = jax.random.normal(ks[2], (b, n, d)) * 10
    noise = jax.random.normal(ks[3], (b, n, d)) * 2
    encodings = jax.random.normal(ks[4], (b, h))

    # ours: dynamics flow applied to the physical particles first
    particles_dyn, jac_dyn = jdyn.nf_dynamic_model(
        dyn_chain, dyn_vars, particles_phys, use_nf=nf
    )
    measure = lambda enc, p: jnp.sum(p**2, axis=-1) * 1e-2  # noqa: E731
    propose, lki, prior, propose_log = jdyn.proposal_likelihood(
        cond_chain, cond_vars, dyn_chain, dyn_vars, measure,
        particles_dyn, particles_phys, encodings, noise, jac_dyn,
        nf, nf_cond, pos_noise, vel_noise,
    )

    # reference on the same numbers
    ref_dyn = _build_ref_chain(dyn_vars["params"], 2, d, 2 * d)
    ref_cond = _build_ref_chain(cond_vars["params"], 2, d, h + 2 * d)
    from model.models import nf_dynamic_model as ref_nfdyn

    t = lambda a: torch.tensor(np.asarray(a))  # noqa: E731
    tphys = t(particles_phys)
    with torch.no_grad():
        tdyn, tjac = ref_nfdyn(ref_dyn, tphys, (b, n), NF=nf)
        tmeasure = lambda enc, p: torch.sum(p**2, dim=-1) * 1e-2  # noqa: E731
        tout = ref_pl(
            ref_cond, ref_dyn, tmeasure, tdyn, tphys, t(encodings),
            t(noise), tjac, nf, nf_cond,
            compute_normal_density(pos_noise=pos_noise, vel_noise=vel_noise),
        )
    tpropose, tlki, tprior, tpropose_log = tout

    np.testing.assert_allclose(np.asarray(particles_dyn), tdyn.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jac_dyn), tjac.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(propose), tpropose.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lki), tlki.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prior), tprior.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(propose_log), tpropose_log.numpy(),
                               rtol=1e-4, atol=1e-4)
