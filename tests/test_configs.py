"""The five BASELINE.json benchmark configurations, end-to-end at tiny scale.

1. Bootstrap DPF, gaussian measurement, soft resampling
2. DPF with entropy-regularised OT resampler
3. CNF-DPF: conditional RealNVP dynamics + proposal (--NF-dyn --NF-cond)
4. DPF-CM: conditional RealNVP measurement (--measurement CRNVP)
5. CGLOW measurement + NF dynamics, semi-supervised, particles sharded
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from nfdpf_tpu.train import Trainer


def _cfg(**kw):
    base = dict(num_particles=12, sequence_length=4, batch_size=2)
    base.update(kw)
    return DPFConfig(**base)


def _batch(key, cfg, batch=2):
    ks = jax.random.split(key, 3)
    t = cfg.sequence_length
    return {
        "image": jax.random.uniform(ks[0], (batch, t, 128, 128, 3)),
        "state": jax.random.normal(ks[1], (batch, t, 4)) * 10,
        "start_state": jax.random.normal(ks[2], (batch, 4)) * 10,
    }


def _run_two_steps(cfg, mesh=None, batch_size=2):
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), cfg, batch=batch_size)
    if mesh is not None:
        state = replicate(state, mesh)
        batch = shard_batch(batch, mesh)
    step = trainer.make_train_step()
    state, m1 = step(state, batch, jax.random.PRNGKey(2))
    state, m2 = step(state, batch, jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(m1["loss"])) and bool(jnp.isfinite(m2["loss"]))
    return float(m1["loss"]), float(m2["loss"])


def test_config1_bootstrap_gaussian_soft():
    _run_two_steps(_cfg(measurement="gaussian", resampler_type="soft"))


def test_config2_ot_resampler():
    _run_two_steps(_cfg(measurement="cos", resampler_type="ot", max_iter=10))


def test_config3_cnf_dpf():
    _run_two_steps(_cfg(measurement="cos", resampler_type="ot", max_iter=10,
                        nf_dyn=True, nf_cond=True))


def test_config4_dpf_cm_crnvp():
    _run_two_steps(_cfg(measurement="CRNVP", resampler_type="soft"))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_config5_cglow_nf_semisupervised_sharded():
    mesh = make_mesh(particle=2)
    cfg = _cfg(
        measurement="CGLOW", nf_dyn=True, train_type="SDPF",
        labeled_ratio=0.5, block_length=2, resampler_type="soft",
        num_particles=16, batch_size=4,
    )
    _run_two_steps(cfg, mesh=mesh, batch_size=4)
