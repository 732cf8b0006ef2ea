"""Golden-value parity of the conditional GLOW stack against the PyTorch
reference (`/root/reference/nf/cglow/{modules,CGlowModel}.py`).

Strategy (as in test_reference_parity.py): initialise OUR flax model,
randomise every parameter leaf, load the same values into the reference
torch modules (transposing conv kernels OIHW↔HWIO and dense kernels), and
assert that (z, nll) and the decode path agree numerically.

Covers: CondActNorm, Cond1x1Conv, CondAffineCoupling, Squeeze channel
ordering, Split2d conditional prior, and the bits/dim objective assembly —
the parts of the reference not touched by the 1-D flow parity tests.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from nfdpf_tpu.models.cglow import CondGlowModel  # noqa: E402


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def _copy_conv(tconv, p):
    """flax nn.Conv kernel (kh, kw, I, O) → torch Conv2d weight (O, I, kh, kw)."""
    with torch.no_grad():
        tconv.weight.copy_(_t(p["kernel"]).permute(3, 2, 0, 1))
        if tconv.bias is not None and "bias" in p:
            tconv.bias.copy_(_t(p["bias"]))


def _copy_dense(tlin, p):
    with torch.no_grad():
        tlin.weight.copy_(_t(p["kernel"]).T)
        tlin.bias.copy_(_t(p["bias"]))


def _copy_condnet(t_con, t_lin, p):
    """ConditioningNet params → reference x_Con/x_Linear Sequentials."""
    convs = [m for m in t_con if isinstance(m, torch.nn.Conv2d)]
    for i, c in enumerate(convs):
        _copy_conv(c, p[f"ConvResize_{i}"]["Conv_0"])
    lins = [m for m in t_lin if isinstance(m, torch.nn.Linear)]
    _copy_dense(lins[0], p["DenseZeros_0"]["Dense_0"])
    _copy_dense(lins[1], p["DenseZeros_1"]["Dense_0"])
    head = p.get("DenseZeros_2") or p.get("DenseNorm_0")
    _copy_dense(lins[2], head["Dense_0"])


def _copy_image_actnorm(t_an, p):
    with torch.no_grad():
        t_an.bias.copy_(_t(p["bias"]).reshape(1, -1, 1, 1))
        t_an.logs.copy_(_t(p["logs"]).reshape(1, -1, 1, 1))


def _copy_affine(t_aff, p):
    rconvs = [m for m in t_aff.resize_x if isinstance(m, torch.nn.Conv2d)]
    _copy_conv(rconvs[0], p["rx1"]["Conv_0"])
    _copy_conv(rconvs[1], p["rx2"]["Conv_0"])
    _copy_conv(rconvs[2], p["rx3"]["Conv_0"])
    f1, f2, f3 = t_aff.f[0], t_aff.f[2], t_aff.f[4]
    _copy_conv(f1, p["f1"]["Conv_0"])
    _copy_image_actnorm(f1.actnorm, p["f1"]["ImageActNorm_0"])
    _copy_conv(f2, p["f2"]["Conv_0"])
    _copy_image_actnorm(f2.actnorm, p["f2"]["ImageActNorm_0"])
    _copy_conv(f3, p["f3"]["Conv_0"])
    with torch.no_grad():
        f3.logs.copy_(_t(p["f3"]["logs"]).reshape(-1, 1, 1))
        f3.newbias.copy_(_t(p["f3"]["newbias"]).reshape(-1, 1, 1))


def _copy_step(t_step, p):
    _copy_condnet(t_step.actnorm.x_Con, t_step.actnorm.x_Linear,
                  p["actnorm"]["net"])
    _copy_condnet(t_step.invconv.x_Con, t_step.invconv.x_Linear,
                  p["invconv"]["net"])
    _copy_affine(t_step.affine, p["affine"])


def _copy_split(t_split, p):
    _copy_conv(t_split.conv[0], p["prior_conv"]["Conv_0"])


def _randomise(params, key, std=0.15):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [std * jax.random.normal(k, l.shape, l.dtype)
           for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def _build_pair(flow_depth, num_levels, key):
    """Return (flax model, randomised variables, loaded torch model)."""
    from nf.cglow.CGlowModel import CondGlowModel as TorchCGlow

    model = CondGlowModel(flow_depth=flow_depth, num_levels=num_levels)
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    params = _randomise(variables["params"], key)
    variables = {"params": params}

    class Args:
        x_size = (3, 8, 8)
        y_size = (3, 8, 8)
        x_hidden_channels = 8
        x_hidden_size = 16
        y_hidden_channels = 8
        learn_top = False
        y_bins = 256.0

    Args.flow_depth = flow_depth
    Args.num_levels = num_levels
    tmodel = TorchCGlow(Args()).eval().double().float()

    tmods = [m for m in tmodel.flow.layers]
    step_i = 0
    for m in tmods:
        name = type(m).__name__
        if name == "CondGlowStep":
            _copy_step(m, params[f"layer_mods_{step_i}"])
            step_i += 1
        elif name == "Split2d":
            _copy_split(m, params[f"layer_mods_{step_i}"])
            step_i += 1
    return model, variables, tmodel


@pytest.mark.parametrize("flow_depth,num_levels", [(1, 1), (2, 1), (1, 2)])
def test_cglow_nll_matches_reference(flow_depth, num_levels):
    key = jax.random.PRNGKey(42)
    model, variables, tmodel = _build_pair(flow_depth, num_levels, key)

    kx, ky = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (2, 8, 8, 3))
    y = jax.random.normal(ky, (2, 8, 8, 3))

    z, nll = model.apply(variables, x, y)

    tx = _t(x).permute(0, 3, 1, 2)
    ty = _t(y).permute(0, 3, 1, 2)
    with torch.no_grad():
        tz, tnll = tmodel(tx, ty, reverse=False)

    np.testing.assert_allclose(np.asarray(nll), tnll.numpy(),
                               rtol=2e-4, atol=2e-4)
    # z layouts differ (NHWC vs NCHW); compare the exact permuted tensor.
    tz_nhwc = tz.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(z), tz_nhwc, rtol=2e-4, atol=2e-4)


def test_cglow_decode_matches_reference(monkeypatch):
    # the reference's reverse path (`modules.py:181,195`) calls .view on the
    # output of torch.inverse, which is non-contiguous for batched inputs in
    # current torch; make it contiguous without touching the reference code.
    _inv = torch.inverse
    monkeypatch.setattr(torch, "inverse", lambda m: _inv(m).contiguous())
    key = jax.random.PRNGKey(3)
    model, variables, tmodel = _build_pair(1, 1, key)

    kx, ky = jax.random.split(jax.random.PRNGKey(9))
    x = jax.random.normal(kx, (2, 8, 8, 3))
    y = jax.random.normal(ky, (2, 8, 8, 3))

    # encode with ours, decode with ours → roundtrip
    z, _ = model.apply(variables, x, y)
    y_rec, _ = model.apply(variables, x, z,
                           jnp.zeros(z.shape[:1]), method=CondGlowModel.decode)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y),
                               rtol=5e-3, atol=5e-3)

    # decode parity vs reference on the same z
    tx = _t(x).permute(0, 3, 1, 2)
    # .contiguous(): the reference's grouped-conv reverse path calls .view on
    # the input and errors on non-contiguous tensors (modules.py:192)
    tz = _t(np.asarray(z)).permute(0, 3, 1, 2).contiguous()
    with torch.no_grad():
        ty_rec, _ = tmodel(tx, tz, reverse=True)
    np.testing.assert_allclose(np.asarray(y_rec),
                               ty_rec.permute(0, 2, 3, 1).numpy(),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("flow_depth,num_levels", [(1, 1), (2, 1)])
def test_cglow_nll_gradients_match_reference(flow_depth, num_levels):
    """GRADIENT golden parity: d mean(nll) / d(y, x) against torch autograd.

    Input gradients traverse every layer's backward — including the custom
    pivoted-logabsdet/inverse VJPs in `nfdpf_tpu/ops/linalg.py` (the 1×1
    conv weight is *generated from* x, so ∂nll/∂x flows through
    ∂logabsdet(W(x))/∂W) and the conditioning towers.  Forward golden tests
    can pass while training diverges if any custom VJP is wrong; this pins
    the training-relevant quantity (CGLOW triage, round 4)."""
    key = jax.random.PRNGKey(11)
    model, variables, tmodel = _build_pair(flow_depth, num_levels, key)

    kx, ky = jax.random.split(jax.random.PRNGKey(13))
    x = jax.random.normal(kx, (2, 8, 8, 3))
    y = jax.random.normal(ky, (2, 8, 8, 3))

    def loss(x_, y_):
        _, nll = model.apply(variables, x_, y_)
        return jnp.mean(nll)

    gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)

    tx = _t(x).permute(0, 3, 1, 2).requires_grad_(True)
    ty = _t(y).permute(0, 3, 1, 2).requires_grad_(True)
    _, tnll = tmodel(tx, ty, reverse=False)
    tnll.mean().backward()

    np.testing.assert_allclose(np.asarray(gx),
                               tx.grad.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gy),
                               ty.grad.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-3, atol=2e-4)


def test_cglow_nll_param_gradients_match_reference():
    """Parameter-gradient golden parity for a coupling conv kernel and a
    conditioning-tower dense kernel (the two weight families whose VJPs
    differ most from torch's: HWIO conv + packed patch-matmul towers)."""
    key = jax.random.PRNGKey(17)
    model, variables, tmodel = _build_pair(1, 1, key)

    kx, ky = jax.random.split(jax.random.PRNGKey(19))
    x = jax.random.normal(kx, (2, 8, 8, 3))
    y = jax.random.normal(ky, (2, 8, 8, 3))

    def loss(params):
        _, nll = model.apply({"params": params}, x, y)
        return jnp.mean(nll)

    g = jax.grad(loss)(variables["params"])

    tx = _t(x).permute(0, 3, 1, 2)
    ty = _t(y).permute(0, 3, 1, 2)
    tmodel.zero_grad()
    _, tnll = tmodel(tx, ty, reverse=False)
    tnll.mean().backward()

    tstep = [m for m in tmodel.flow.layers
             if type(m).__name__ == "CondGlowStep"][0]
    # coupling net f1 conv kernel (flax HWIO vs torch OIHW)
    g_f1 = np.asarray(g["layer_mods_0"]["affine"]["f1"]["Conv_0"]["kernel"])
    t_f1 = tstep.affine.f[0].weight.grad.permute(2, 3, 1, 0).numpy()
    np.testing.assert_allclose(g_f1, t_f1, rtol=2e-3, atol=2e-4)
    # invconv conditioning-tower output dense kernel
    head = g["layer_mods_0"]["invconv"]["net"]
    head = head.get("DenseZeros_2") or head["DenseNorm_0"]
    g_lin = np.asarray(head["Dense_0"]["kernel"])
    t_lins = [m for m in tstep.invconv.x_Linear
              if isinstance(m, torch.nn.Linear)]
    t_lin = t_lins[2].weight.grad.T.numpy()
    np.testing.assert_allclose(g_lin, t_lin, rtol=2e-3, atol=2e-4)
