"""Model zoo: shapes, invertibility, and measurement-model invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.models.cglow import CondGlowModel, squeeze2d, unsqueeze2d
from nfdpf_tpu.models.measurement import build_measurement_model
from nfdpf_tpu.models.nets import (
    ObservationDecoder,
    ObservationEncoder,
    ParticleEncoder,
)


def test_encoder_decoder_shapes_and_batchstats():
    key = jax.random.PRNGKey(0)
    enc = ObservationEncoder(out_features=32)
    dec = ObservationDecoder(in_features=32)
    img = jax.random.uniform(key, (4, 128, 128, 3))
    ev = enc.init(key, img, train=False)
    code, bn = enc.apply(ev, img, train=True, mutable=["batch_stats"])
    assert code.shape == (4, 32)
    dv = dec.init(key, code, train=False)
    rec, _ = dec.apply(dv, code, train=True, mutable=["batch_stats"])
    assert rec.shape == (4, 128, 128, 3)
    assert float(rec.min()) >= 0.0 and float(rec.max()) <= 1.0
    # batch stats actually update in train mode
    before = jax.tree_util.tree_leaves(ev["batch_stats"])[0]
    after = jax.tree_util.tree_leaves(bn["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_particle_encoder_batch_polymorphism():
    key = jax.random.PRNGKey(1)
    pe = ParticleEncoder(out_features=32)
    x = jax.random.normal(key, (4, 10, 2))
    v = pe.init(key, x)
    out = pe.apply(v, x)
    assert out.shape == (4, 10, 32)
    flat = pe.apply(v, x.reshape(40, 2))
    np.testing.assert_allclose(np.asarray(out).reshape(40, 32), np.asarray(flat),
                               rtol=1e-6)


@pytest.mark.parametrize("kind", ["cos", "NN", "gaussian", "CRNVP"])
def test_measurement_models(kind):
    cfg = DPFConfig(measurement=kind)
    m = build_measurement_model(cfg)
    key = jax.random.PRNGKey(2)
    enc = jax.random.normal(key, (3, 32))
    particles = jax.random.normal(jax.random.PRNGKey(3), (3, 7, 2)) * 10
    v = m.init(key, enc, particles)
    lik = m.apply(v, enc, particles)
    assert lik.shape == (3, 7)
    assert bool(jnp.all(jnp.isfinite(lik)))
    if kind in ("gaussian", "CRNVP"):
        # max-subtraction → row max == 0 (`model/models.py:252,276`)
        np.testing.assert_allclose(np.asarray(jnp.max(lik, axis=-1)), 0.0,
                                   atol=1e-6)


def test_measurement_cglow():
    cfg = DPFConfig(measurement="CGLOW")
    m = build_measurement_model(cfg)
    key = jax.random.PRNGKey(4)
    enc = jax.random.normal(key, (2, 192))
    particles = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 2)) * 10
    v = m.init(key, enc, particles)
    lik = m.apply(v, enc, particles)
    assert lik.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(lik)))
    np.testing.assert_allclose(np.asarray(jnp.max(lik, axis=-1)), 0.0, atol=1e-5)


def test_squeeze_unsqueeze_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 3))
    s = squeeze2d(x)
    assert s.shape == (2, 4, 4, 12)
    np.testing.assert_allclose(np.asarray(unsqueeze2d(s)), np.asarray(x))


def test_cglow_encode_decode_roundtrip():
    """The conditional GLOW must be invertible given the same condition."""
    model = CondGlowModel()
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, 8, 8, 3))
    y = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 3))
    v = model.init(key, x, y)
    z, nll = model.apply(v, x, y)
    assert z.shape == (2, 4, 4, 12) and nll.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(nll)))
    logdet0 = jnp.zeros(2)
    y_rec, _ = model.apply(v, x, z, logdet0, method=model.decode)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)


def test_cglow_logdet_consistency():
    """encode logdet (minus dequant constant + prior) must invert decode's."""
    model = CondGlowModel()
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (2, 8, 8, 3))
    y = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 3))
    v = model.init(key, x, y)
    z, ld_enc = model.apply(v, x, y, jnp.zeros(2), method=model.encode)
    _, ld_dec = model.apply(v, x, z, jnp.zeros(2), method=model.decode)
    np.testing.assert_allclose(np.asarray(ld_enc + ld_dec), 0.0, atol=1e-3)


def test_torch_init_matches_torch_defaults():
    """--torch-init must reproduce torch's kaiming_uniform(a=√5) bounds:
    U(±1/√fan_in) for Dense/Conv kernels AND Dense biases
    (`model/models.py:10-159` inherits these torch defaults)."""
    from nfdpf_tpu.models.nets import (
        ObservationDecoder,
        ObservationEncoder,
        ParticleEncoder,
    )

    enc = ObservationEncoder(32, torch_init=True)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                 train=False)
    k0 = v["params"]["Conv_0"]["kernel"]          # fan_in = 3·4·4 = 48
    assert float(jnp.abs(k0).max()) <= 48 ** -0.5 + 1e-7
    assert float(jnp.abs(k0).max()) > 0.8 * 48 ** -0.5   # uniform, not normal
    d0 = v["params"]["Dense_0"]
    bound = (256 * 16) ** -0.5
    assert float(jnp.abs(d0["kernel"]).max()) <= bound + 1e-7
    assert float(jnp.abs(d0["bias"]).max()) <= bound + 1e-7
    assert float(jnp.abs(d0["bias"]).max()) > 0.0        # torch bias ≠ zeros

    dec = ObservationDecoder(32, torch_init=True)
    vd = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)), train=False)
    ct = vd["params"]["ConvTranspose_0"]["kernel"]  # torch fan_in = out·kh·kw
    assert float(jnp.abs(ct).max()) <= (128 * 16) ** -0.5 + 1e-7

    pe = ParticleEncoder(32, torch_init=True)
    vp = pe.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)))
    assert float(jnp.abs(vp["params"]["Dense_0"]["kernel"]).max()) <= 2 ** -0.5

    # param pytree identical to the default init (same layer names/shapes)
    v_def = ObservationEncoder(32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)
    assert (jax.tree_util.tree_structure(v_def)
            == jax.tree_util.tree_structure(v))
