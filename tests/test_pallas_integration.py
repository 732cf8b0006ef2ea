"""use_pallas filter path (fused coupling + streaming OT) vs the XLA path.

Interpret-mode on CPU; same rng keys → outputs must agree closely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfdpf_tpu.ops.pallas.coupling_pallas as cp
import nfdpf_tpu.ops.pallas.sinkhorn_pallas as sp
from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.models.dpf import DPF


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(cp, "_INTERPRET", True)
    monkeypatch.setattr(sp, "_INTERPRET", True)


def _batch(key, cfg, batch=2):
    ks = jax.random.split(key, 3)
    t = cfg.sequence_length
    return (
        jax.random.uniform(ks[0], (batch, t, 128, 128, 3)),
        jax.random.normal(ks[1], (batch, 4)) * 10,
        jax.random.normal(ks[2], (batch, t, 2)) * 2,
    )


def test_use_pallas_filter_matches_xla_path():
    base = dict(num_particles=16, sequence_length=3, batch_size=2,
                nf_dyn=True, nf_cond=True, measurement="cos",
                resampler_type="soft")
    cfg_ref = DPFConfig(**base)
    cfg_pl = DPFConfig(use_pallas=True, pallas_coupling=True, **base)

    engine_ref = DPF(cfg_ref)
    engine_pl = DPF(cfg_pl)
    variables = engine_ref.init(jax.random.PRNGKey(0))
    images, start, vel = _batch(jax.random.PRNGKey(1), cfg_ref)
    key = jax.random.PRNGKey(2)

    out_ref, _, _ = engine_ref.filter(variables, images, start, vel, key,
                                      train=False)
    out_pl, _, _ = engine_pl.filter(variables, images, start, vel, key,
                                    train=False)
    np.testing.assert_allclose(np.asarray(out_pl.particles),
                               np.asarray(out_ref.particles),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_pl.jacobians),
                               np.asarray(out_ref.jacobians),
                               rtol=1e-4, atol=1e-4)


def test_use_pallas_gradients_flow_to_flow_params():
    cfg = DPFConfig(num_particles=16, sequence_length=3, batch_size=2,
                    nf_dyn=True, nf_cond=True, measurement="cos",
                    resampler_type="soft", use_pallas=True,
                    pallas_coupling=True)
    engine = DPF(cfg)
    variables = engine.init(jax.random.PRNGKey(0))
    images, start, vel = _batch(jax.random.PRNGKey(1), cfg)

    def loss(variables):
        out, _, _ = engine.filter(variables, images, start, vel,
                                  jax.random.PRNGKey(2), train=False)
        return jnp.sum(out.particles**2) + jnp.sum(out.jacobians**2)

    grads = jax.grad(loss)(variables)
    for name in ("nf_dyn", "cond_model"):
        leaves = jax.tree_util.tree_leaves(grads[name])
        assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves), name
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves), name
