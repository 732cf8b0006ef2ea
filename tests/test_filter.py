"""Filter engine: end-to-end filtering invariants under jit + grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.models.dpf import DPF, particle_initialization
from nfdpf_tpu.models.dynamics import proposal_likelihood, motion_update
from nfdpf_tpu.ops.density import log_normal_density


def _small_cfg(**kw):
    base = dict(
        num_particles=16, sequence_length=5, batch_size=2, width=128,
        resampler_type="soft", measurement="cos", hidden_size=32,
    )
    base.update(kw)
    return DPFConfig(**base)


def _synthetic_batch(key, cfg, batch=2):
    k1, k2, k3 = jax.random.split(key, 3)
    t = cfg.sequence_length
    images = jax.random.uniform(k1, (batch, t, cfg.width, cfg.width, 3))
    start_state = jax.random.normal(k2, (batch, 4)) * 5
    vel = jax.random.normal(k3, (batch, t, 2)) * 2
    return images, start_state, vel


def test_particle_initialization_modes():
    key = jax.random.PRNGKey(0)
    start = jnp.array([[10.0, -5.0, 1.0, 1.0]])
    p_true, w = particle_initialization(key, start[:, :2], 128.0, 50, 2, True)
    assert p_true.shape == (1, 50, 2)
    assert abs(float(p_true.mean(axis=1)[0, 0]) - 10.0) < 1.0
    p_unif, w = particle_initialization(key, start[:, :2], 128.0, 50, 2, False)
    assert float(p_unif.min()) >= -64.0 and float(p_unif.max()) <= 64.0
    np.testing.assert_allclose(np.asarray(w), np.log(1.0 / 50))


def test_bootstrap_reduction_identity():
    """NF off → prior_log == propose_log so the weight update degenerates to
    the bootstrap `w += lki` (`model/models.py:374-376`)."""
    cfg = _small_cfg()
    engine = DPF(cfg)
    variables = engine.init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    particles = jax.random.normal(key, (2, 16, 2)) * 10
    vel = jnp.ones((2, 2))
    phys, noise = motion_update(jax.random.PRNGKey(3), particles, vel, cfg.pos_noise)
    enc = jax.random.normal(jax.random.PRNGKey(4), (2, 32))
    propose, lki, prior, propose_log = proposal_likelihood(
        engine.cond_model, variables["cond_model"],
        engine.nf_dyn, variables["nf_dyn"],
        engine._measure_fn(variables),
        phys, phys, enc, noise, jnp.zeros((2, 16)),
        use_nf=False, use_nf_cond=False,
        pos_noise=cfg.pos_noise, vel_noise=cfg.vel_noise,
    )
    np.testing.assert_allclose(np.asarray(prior), np.asarray(propose_log))
    np.testing.assert_allclose(np.asarray(propose), np.asarray(phys))


@pytest.mark.parametrize("resampler", ["soft", "ot"])
def test_filter_runs_and_shapes(resampler):
    cfg = _small_cfg(resampler_type=resampler, max_iter=10)
    engine = DPF(cfg)
    variables = engine.init(jax.random.PRNGKey(0))
    images, start, vel = _synthetic_batch(jax.random.PRNGKey(1), cfg)
    out, encodings, _ = engine.filter(
        variables, images, start, vel, jax.random.PRNGKey(2), train=False
    )
    b, t, n = 2, cfg.sequence_length, cfg.num_particles
    assert out.particles.shape == (b, t, n, 2)
    assert out.weights.shape == (b, t, n)
    assert out.noise.shape == (b, t, n, 2)
    assert out.likelihoods.shape == (b, t, n)
    assert out.indices.shape == (b, t, n)
    assert encodings.shape == (b, t, 32)
    # weights normalised (+ the reference's 1e-12 floor)
    sums = np.asarray(jnp.sum(out.weights, axis=-1))
    np.testing.assert_allclose(sums, 1.0 + n * 1e-12, rtol=1e-4)
    assert bool(jnp.all(jnp.isfinite(out.obs_likelihood)))


def test_filter_with_flows_runs():
    cfg = _small_cfg(nf_dyn=True, nf_cond=True, measurement="CRNVP")
    engine = DPF(cfg)
    variables = engine.init(jax.random.PRNGKey(0))
    images, start, vel = _synthetic_batch(jax.random.PRNGKey(1), cfg)
    out, _, _ = engine.filter(
        variables, images, start, vel, jax.random.PRNGKey(2), train=False
    )
    assert bool(jnp.all(jnp.isfinite(out.particles)))
    assert bool(jnp.all(jnp.isfinite(out.jacobians)))
    assert bool(jnp.all(jnp.isfinite(out.priors)))
    # NF on → jacobians are non-trivial
    assert float(jnp.sum(jnp.abs(out.jacobians))) > 0


def test_filter_jit_and_grad():
    cfg = _small_cfg()
    engine = DPF(cfg)
    variables = engine.init(jax.random.PRNGKey(0))
    images, start, vel = _synthetic_batch(jax.random.PRNGKey(1), cfg)

    @jax.jit
    def loss_fn(variables):
        out, _, _ = engine.filter(
            variables, images, start, vel, jax.random.PRNGKey(2), train=False
        )
        from nfdpf_tpu.losses import supervised_loss
        state = jnp.zeros((2, cfg.sequence_length, 4))
        loss, _ = supervised_loss(out.particles, out.weights, state,
                                  1.0, train=False)
        return loss

    loss = loss_fn(variables)
    assert bool(jnp.isfinite(loss))
    grads = jax.jit(jax.grad(loss_fn))(variables)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # gradient reaches the measurement model's particle encoder
    g_meas = jax.tree_util.tree_leaves(grads["measurement"])
    assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in g_meas)


def test_ess_gate_both_ways():
    """ESS gate: threshold > 1 → resample every step (ESS ≤ N always);
    threshold = 0 → never resample (identity ancestor indices)."""
    images, start, vel = _synthetic_batch(
        jax.random.PRNGKey(1), _small_cfg()
    )
    identity = np.arange(16)[None, None, :]

    cfg_always = _small_cfg(resampler_type="soft", alpha=0.5, ess_threshold=1.01)
    engine = DPF(cfg_always)
    variables = engine.init(jax.random.PRNGKey(0))
    out, _, _ = engine.filter(
        variables, images, start, vel, jax.random.PRNGKey(2), train=False
    )
    assert not np.all(np.asarray(out.indices) == identity), \
        "gate never fired despite threshold > 1"

    cfg_never = _small_cfg(resampler_type="soft", ess_threshold=0.0)
    engine2 = DPF(cfg_never)
    out2, _, _ = engine2.filter(
        engine2.init(jax.random.PRNGKey(0)), images, start, vel,
        jax.random.PRNGKey(2), train=False,
    )
    assert np.all(np.asarray(out2.indices) == identity)


def test_remat_scan_step_identical_results():
    """remat trades FLOPs for BPTT memory; results must be identical."""
    images, start, vel = _synthetic_batch(jax.random.PRNGKey(1), _small_cfg())
    outs = []
    for remat in (False, True):
        cfg = _small_cfg(remat_scan_step=remat)
        engine = DPF(cfg)
        variables = engine.init(jax.random.PRNGKey(0))

        def loss(variables):
            out, _, _ = engine.filter(variables, images, start, vel,
                                      jax.random.PRNGKey(2), train=False)
            return jnp.sum(out.particles**2)

        val, grads = jax.value_and_grad(loss)(variables)
        outs.append((float(val), grads))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    for g0, g1 in zip(jax.tree_util.tree_leaves(outs[0][1]),
                      jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4,
                                   atol=1e-6)


def test_resampled_gate_history():
    """FilterOutput.resampled records ESS-gate firings (`DPFs.py:163-170`):
    with uniform init over the full image the weights collapse fast, so the
    gate must fire at least once; with a huge threshold it fires every step;
    with threshold 0 it never fires."""
    key = jax.random.PRNGKey(0)
    for thr, pred in ((1.1, "all"), (0.0, "none")):
        cfg = _small_cfg(ess_threshold=thr, init_with_true_state=False)
        engine = DPF(cfg)
        variables = engine.init(jax.random.PRNGKey(1))
        images, start, vel = _synthetic_batch(jax.random.PRNGKey(2), cfg)
        out, _, _ = engine.filter(variables, images, start, vel, key,
                                  train=False)
        got = np.asarray(out.resampled)
        assert got.shape == (cfg.sequence_length,)
        assert got.all() if pred == "all" else not got.any()


def test_filter_warm_start_streaming_ot():
    """sinkhorn_warm_start carries potentials through the scan: the filter
    runs under jit, emits per-step iteration telemetry, and warm firings
    after the first cost fewer Sinkhorn iterations (the config-5 lever)."""
    import nfdpf_tpu.ops.pallas.sinkhorn_pallas as sp

    old = sp._INTERPRET
    sp._INTERPRET = True
    try:
        key = jax.random.PRNGKey(0)
        outs = {}
        for warm in (False, True):
            cfg = _small_cfg(
                resampler_type="ot", use_pallas=True,
                sinkhorn_warm_start=warm,
                ess_threshold=1.1,   # fire every step
                init_with_true_state=False,
            )
            engine = DPF(cfg)
            variables = engine.init(jax.random.PRNGKey(1))
            images, start, vel = _synthetic_batch(jax.random.PRNGKey(2), cfg)
            out, _, _ = engine.filter(variables, images, start, vel, key,
                                      train=False)
            iters = np.asarray(out.sinkhorn_iters)
            assert iters.shape == (cfg.sequence_length,)
            assert (iters > 0).all()          # gate fired every step
            assert np.isfinite(np.asarray(out.particles)).all()
            outs[warm] = iters
        # first firing is cold either way
        assert outs[True][0] == outs[False][0]
        # warm continuation is at worst neutral in this adversarial toy
        # regime (16 untrained particles, firing every step; several
        # firings saturate max_iter on BOTH sides).  The iteration
        # REDUCTION contract is proven in
        # tests/test_pallas.py::test_warm_start_same_fixed_point_fewer_iters
        # and measured in the real N=10k regime (BASELINE.md config 5).
        assert outs[True][1:].sum() <= outs[False][1:].sum() * 1.1
    finally:
        sp._INTERPRET = old


def test_filter_warm_start_requires_streaming_path():
    cfg = _small_cfg(resampler_type="soft", sinkhorn_warm_start=True)
    engine = DPF(cfg)
    variables = engine.init(jax.random.PRNGKey(1))
    images, start, vel = _synthetic_batch(jax.random.PRNGKey(2), cfg)
    with pytest.raises(ValueError, match="warm_start"):
        engine.filter(variables, images, start, vel, jax.random.PRNGKey(0),
                      train=False)


def test_encode_per_step_ablation():
    """encode_per_step runs the conv encoder inside the scan (per-step BN
    batch statistics, `DPFs.py:177`); eval mode is unaffected (BN running
    stats make hoisted and per-step encodes the same function)."""
    from nfdpf_tpu.train import Trainer

    key = jax.random.PRNGKey(0)
    cfg = _small_cfg(encode_per_step=True)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(1))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    t = cfg.sequence_length
    batch = {
        "image": jax.random.uniform(k1, (2, t, 128, 128, 3)),
        "state": jax.random.normal(k2, (2, t, 4)) * 10,
        "start_state": jax.random.normal(k3, (2, 4)) * 10,
    }
    step = trainer.make_train_step()
    new_state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))

    # BN running stats differ from the hoisted mode after one step: the
    # per-step path applies T per-step updates + one full-frame AE update
    cfg_h = _small_cfg(encode_per_step=False)
    trainer_h = Trainer(cfg_h)
    state_h = trainer_h.init_state(jax.random.PRNGKey(1))
    new_h, _ = trainer_h.make_train_step()(state_h, batch, key)
    a = jax.tree_util.tree_leaves(new_state.rest["encoder"]["batch_stats"])
    b = jax.tree_util.tree_leaves(new_h.rest["encoder"]["batch_stats"])
    assert any(
        not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
    )

    # eval: per-step and hoisted are identical functions in eval mode
    # (fresh states: the train step donated/consumed the originals)
    ev = trainer.make_eval_step()
    ev_h = trainer_h.make_eval_step()
    m1, _ = ev(trainer.init_state(jax.random.PRNGKey(1)), batch, key)
    m2, _ = ev_h(trainer_h.init_state(jax.random.PRNGKey(1)), batch, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
