"""Conditional GLOW (image-space conditional normalizing flow).

TPU-native counterpart of `/root/reference/nf/cglow/{modules,CGlowModel}.py`.
Tensors are NHWC.  The per-sample invertible 1×1 convolution is a batched
``einsum`` (one MXU contraction) instead of the reference's grouped-conv
trick (`nf/cglow/modules.py:188-211`), and squeeze/unsqueeze are pure
reshape/transposes.

Structure (defaults: x=y=(8,8,3), K=1, L=1, `arguments.py:88-98`):
  CondGlowModel
    └─ CondGlow: L × [Squeeze ; K × CondGlowStep ; Split2d (if l<L−1)]
         CondGlowStep = CondActNorm → Cond1x1Conv → CondAffineCoupling
  nll = −(logdet + prior logp − log(n_bins)·D) / (log 2 · D)   [bits/dim]
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nfdpf_tpu.ops import linalg

Array = jax.Array


# --------------------------------------------------------------------------
# init helpers mirroring the reference's custom conv/linear initialisations
# --------------------------------------------------------------------------

def _normal_init(std):
    return nn.initializers.normal(stddev=std)


class _PatchConv(nn.Module):
    """Non-overlapping (stride == kernel) conv as space-to-depth + matmul.

    Mathematically identical to ``nn.Conv(..., strides=kernel,
    padding='VALID')`` with the same (kh, kw, I, O) kernel layout, but
    avoids materialising lane-padded NHWC conv buffers: a (B·N, 8, 8, 3)
    activation is padded to 128 lanes by the TPU conv (≈43× wasted HBM
    traffic at CGLOW's channel counts), while the patch-matmul form is a
    (rows, kh·kw·I) × (kh·kw·I, O) GEMM on dense features.  Parameters live
    under the same ``Conv_0/{kernel,bias}`` names as the conv form so
    checkpoints and the reference-parity weight mapping are unchanged.
    """

    kh: int
    kw: int
    out_channels: int
    kernel_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.kh, self.kw, in_ch, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        lead = x.shape[:-3]
        h, w = x.shape[-3], x.shape[-2]
        ho, wo = h // self.kh, w // self.kw
        x = x.reshape(lead + (ho, self.kh, wo, self.kw, in_ch))
        # (..., ho, kh, wo, kw, C) -> (..., ho, wo, kh, kw, C): matches the
        # conv kernel's (kh, kw, I, O) contraction order exactly
        nd = x.ndim
        x = jnp.moveaxis(x, nd - 4, nd - 3)
        x = x.reshape(lead + (ho, wo, self.kh * self.kw * in_ch))
        wmat = kernel.reshape(self.kh * self.kw * in_ch, self.out_channels)
        return x @ wmat + bias


class ConvResize(nn.Module):
    """Conv whose stride/kernel are computed to hit an exact output size,
    zero-init weights (`nf/cglow/modules.py:47-61`).

    At CGLOW's sizes the stride always equals the kernel (8→4→2→1 halvings),
    so the conv is non-overlapping and compiled as a patch-matmul
    (``_PatchConv``); the general overlapping case falls back to ``nn.Conv``.
    Parameter tree is identical either way (``Conv_0/{kernel,bias}``).
    """

    in_hw: Tuple[int, int]
    out_hw: Tuple[int, int]
    out_channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        sh = self.in_hw[0] // self.out_hw[0]
        sw = self.in_hw[1] // self.out_hw[1]
        kh = self.in_hw[0] - (self.out_hw[0] - 1) * sh
        kw = self.in_hw[1] - (self.out_hw[1] - 1) * sw
        if (kh, kw) == (sh, sw):
            return _PatchConv(kh, kw, self.out_channels,
                              name="Conv_0")(x)
        return nn.Conv(self.out_channels, (kh, kw), strides=(sh, sw),
                       padding="VALID", kernel_init=nn.initializers.zeros)(x)


class ConvZeros(nn.Module):
    """k3 'same' conv with weights ~ N(0, 0.1) (`nf/cglow/modules.py:38-44`).

    Despite the name (kept for reference parity), weights are NOT zero.
    """

    out_channels: int
    kernel: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.out_channels, self.kernel, padding="SAME",
                       kernel_init=_normal_init(0.1))(x)


class ImageActNorm(nn.Module):
    """Per-channel affine over NHWC with N(0, 0.05) init
    (`nf/cglow/modules.py:8-35`)."""

    num_channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bias = self.param("bias", _normal_init(0.05), (self.num_channels,))
        logs = self.param("logs", _normal_init(0.05), (self.num_channels,))
        return (x + bias) * jnp.exp(logs)


class ConvNormY(nn.Module):
    """Conv (no bias, N(0,0.05)) + ImageActNorm (`nf/cglow/modules.py:214-230`)."""

    out_channels: int
    kernel: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.out_channels, self.kernel, padding="SAME",
                    use_bias=False, kernel_init=_normal_init(0.05))(x)
        return ImageActNorm(self.out_channels)(x)


class ConvZerosY(nn.Module):
    """Zero-init conv + learned bias and ×exp(3·logs) scale
    (`nf/cglow/modules.py:233-253`) — the coupling's zero-at-init head."""

    out_channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)(x)
        logs = self.param("logs", nn.initializers.zeros, (self.out_channels,))
        newbias = self.param("newbias", nn.initializers.zeros, (self.out_channels,))
        return (x + newbias) * jnp.exp(logs * 3.0)


class DenseZeros(nn.Module):
    """Zero-init dense (`nf/cglow/modules.py:407-416`)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.features, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(x)


class DenseNorm(nn.Module):
    """N(0, 0.1) dense, bias too (`nf/cglow/modules.py:419-424`)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.features, kernel_init=_normal_init(0.1),
                        bias_init=_normal_init(0.1))(x)


class ConditioningNet(nn.Module):
    """Shared condition tower: 3× ConvResize (÷2 each) + ReLU, flatten,
    then a 3-layer MLP head (`nf/cglow/modules.py:85-101,146-162`).

    head_init: 'zeros' (CondActNorm — identity at init) or 'norm'
    (Cond1x1Conv's final LinearNorm layer).
    """

    x_hw: Tuple[int, int]
    x_channels: int
    hidden_channels: int
    hidden_size: int
    out_features: int
    head_init: str = "zeros"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.x_hw
        z = x
        hw = (h, w)
        for _ in range(3):
            nhw = (hw[0] // 2, hw[1] // 2)
            z = ConvResize(hw, nhw, self.hidden_channels)(z)
            z = nn.relu(z)
            hw = nhw
        z = z.reshape(z.shape[:-3] + (-1,))
        z = DenseZeros(self.hidden_size)(z)
        z = nn.relu(z)
        z = DenseZeros(self.hidden_size)(z)
        z = nn.relu(z)
        if self.head_init == "zeros":
            z = DenseZeros(self.out_features)(z)
        else:
            z = DenseNorm(self.out_features)(z)
        return jnp.tanh(z)


# --------------------------------------------------------------------------
# flow layers
# --------------------------------------------------------------------------


class CondActNorm(nn.Module):
    """Actnorm whose per-channel scale/bias are generated from the condition
    (`nf/cglow/modules.py:76-132`).  log-det = H·W·Σ logs per sample."""

    x_hw: Tuple[int, int]
    x_channels: int
    x_hidden_channels: int
    x_hidden_size: int
    y_channels: int

    def setup(self):
        self.net = ConditioningNet(
            self.x_hw, self.x_channels, self.x_hidden_channels,
            self.x_hidden_size, 2 * self.y_channels, head_init="zeros"
        )

    def _params_from(self, x: Array):
        out = self.net(x)                        # (B, 2C)
        logs, bias = jnp.split(out, 2, axis=-1)  # "split" mode: first half logs
        return logs[:, None, None, :], bias[:, None, None, :]

    def __call__(self, x, y, logdet, reverse=False):
        logs, bias = self._params_from(x)
        dims = y.shape[-3] * y.shape[-2]
        dlogdet = dims * jnp.sum(logs, axis=(-3, -2, -1))
        if not reverse:
            y = (y + bias) * jnp.exp(logs)
            return y, logdet + dlogdet
        y = y * jnp.exp(-logs) - bias
        return y, logdet - dlogdet


class Cond1x1Conv(nn.Module):
    """Per-sample invertible 1×1 conv with condition-generated weight
    (`nf/cglow/modules.py:136-211`).  Applied as one batched einsum on the
    MXU; log-det = H·W·slogdet(W)."""

    x_hw: Tuple[int, int]
    x_channels: int
    x_hidden_channels: int
    x_hidden_size: int
    y_channels: int

    def setup(self):
        self.net = ConditioningNet(
            self.x_hw, self.x_channels, self.x_hidden_channels,
            self.x_hidden_size, self.y_channels**2, head_init="norm"
        )

    def __call__(self, x, y, logdet, reverse=False):
        c = self.y_channels
        weight = self.net(x).reshape(x.shape[0], c, c)   # (B, out k, in i)
        dims = y.shape[-3] * y.shape[-2]
        # TPU-native batched log|det| / inverse: jnp.linalg's pivoted LU is
        # serial on TPU and was ~90% of the whole CGLOW step (ops/linalg.py).
        dlogdet = linalg.logabsdet(weight) * dims
        if reverse:
            weight = linalg.inv(weight)
            dlogdet = -dlogdet
        z = jnp.einsum("bhwi,bki->bhwk", y, weight)
        return z, logdet + dlogdet


class CondAffineCoupling(nn.Module):
    """Channel-split coupling conditioned on x (`nf/cglow/modules.py:258-303`).

    x is resized to z1's spatial shape, concatenated, pushed through a small
    conv net producing (shift, scale); scale = sigmoid(raw + 2).
    """

    x_hw: Tuple[int, int]
    x_channels: int
    y_half_channels: int
    y_hw: Tuple[int, int]
    hidden_channels: int

    def setup(self):
        self.rx1 = ConvZeros(16)
        self.rx2 = ConvResize((self.x_hw[0], self.x_hw[1]), self.y_hw,
                              self.y_half_channels)
        self.rx3 = ConvZeros(self.y_half_channels)
        self.f1 = ConvNormY(self.hidden_channels)
        self.f2 = ConvNormY(self.hidden_channels, kernel=(1, 1))
        self.f3 = ConvZerosY(2 * self.y_half_channels)

    def _shift_scale(self, x, z1):
        xr = nn.relu(self.rx1(x))
        xr = nn.relu(self.rx2(xr))
        xr = nn.relu(self.rx3(xr))
        h = jnp.concatenate([xr, z1], axis=-1)
        h = nn.relu(self.f1(h))
        h = nn.relu(self.f2(h))
        h = jnp.tanh(self.f3(h))
        # "cross" split: even channels → shift, odd → scale (cglow/utils.py:5-13)
        shift = h[..., 0::2]
        scale = jax.nn.sigmoid(h[..., 1::2] + 2.0)
        return shift, scale

    def __call__(self, x, y, logdet, reverse=False):
        c = y.shape[-1] // 2
        z1, z2 = y[..., :c], y[..., c:]
        shift, scale = self._shift_scale(x, z1)
        if not reverse:
            z2 = (z2 + shift) * scale
            logdet = logdet + jnp.sum(jnp.log(scale), axis=(-3, -2, -1))
        else:
            z2 = z2 / scale - shift
            logdet = logdet - jnp.sum(jnp.log(scale), axis=(-3, -2, -1))
        return jnp.concatenate([z1, z2], axis=-1), logdet


def squeeze2d(x: Array, factor: int = 2) -> Array:
    """Space-to-depth, channel order (c, fh, fw) matching
    `nf/cglow/modules.py:321-331`."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def unsqueeze2d(x: Array, factor: int = 2) -> Array:
    b, h, w, cf = x.shape
    c = cf // (factor * factor)
    x = x.reshape(b, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * factor, w * factor, c)


def gaussian_logp(mean: Array, logs: Array, x: Array) -> Array:
    """Diag-Gaussian log-density summed over HWC (`nf/cglow/modules.py:377-387`)."""
    log2pi = math.log(2 * math.pi)
    ll = -0.5 * (logs * 2.0 + ((x - mean) ** 2) / jnp.exp(logs * 2.0) + log2pi)
    return jnp.sum(ll, axis=(-3, -2, -1))


class Split2d(nn.Module):
    """Halve channels; z2 priced under a learned conditional Gaussian prior
    (`nf/cglow/modules.py:348-374`)."""

    num_channels: int

    def setup(self):
        self.prior_conv = ConvZeros(self.num_channels)

    def _prior(self, z1):
        h = jnp.tanh(self.prior_conv(z1))
        return h[..., 0::2], h[..., 1::2]   # mean, logs ("cross")

    def __call__(self, y, logdet, reverse=False, eps=None):
        if not reverse:
            c = y.shape[-1] // 2
            z1, z2 = y[..., :c], y[..., c:]
            mean, logs = self._prior(z1)
            return z1, logdet + gaussian_logp(mean, logs, z2)
        z1 = y
        mean, logs = self._prior(z1)
        z2 = mean + jnp.exp(logs) * (eps if eps is not None else 0.0)
        return jnp.concatenate([z1, z2], axis=-1), logdet


class CondGlowStep(nn.Module):
    """actnorm → 1×1 conv → affine (`nf/cglow/CGlowModel.py:7-51`)."""

    x_hw: Tuple[int, int]
    x_channels: int
    x_hidden_channels: int
    x_hidden_size: int
    y_channels: int
    y_hw: Tuple[int, int]
    y_hidden_channels: int

    def setup(self):
        self.actnorm = CondActNorm(self.x_hw, self.x_channels,
                                   self.x_hidden_channels, self.x_hidden_size,
                                   self.y_channels)
        self.invconv = Cond1x1Conv(self.x_hw, self.x_channels,
                                   self.x_hidden_channels, self.x_hidden_size,
                                   self.y_channels)
        self.affine = CondAffineCoupling(self.x_hw, self.x_channels,
                                         self.y_channels // 2, self.y_hw,
                                         self.y_hidden_channels)

    def __call__(self, x, y, logdet, reverse=False):
        if not reverse:
            y, logdet = self.actnorm(x, y, logdet, False)
            y, logdet = self.invconv(x, y, logdet, False)
            y, logdet = self.affine(x, y, logdet, False)
        else:
            y, logdet = self.affine(x, y, logdet, True)
            y, logdet = self.invconv(x, y, logdet, True)
            y, logdet = self.actnorm(x, y, logdet, True)
        return y, logdet


class CondGlowModel(nn.Module):
    """Full conditional GLOW (`nf/cglow/CGlowModel.py:54-184`).

    Inputs NHWC: x = condition (particle encoding), y = target (obs encoding).
    ``__call__`` returns (z, nll[bits/dim]); ``decode`` inverts.
    """

    x_size: Tuple[int, int, int] = (3, 8, 8)   # CHW as configured (reference parity)
    y_size: Tuple[int, int, int] = (3, 8, 8)
    x_hidden_channels: int = 8
    x_hidden_size: int = 16
    y_hidden_channels: int = 8
    flow_depth: int = 1       # K
    num_levels: int = 1       # L
    learn_top: bool = False
    y_bins: float = 256.0

    def setup(self):
        cx, hx, wx = self.x_size
        cy, hy, wy = self.y_size
        layers = []
        shapes = []
        c, h, w = cy, hy, wy
        for level in range(self.num_levels):
            c, h, w = c * 4, h // 2, w // 2
            layers.append(("squeeze", None))
            shapes.append((c, h, w))
            for _ in range(self.flow_depth):
                layers.append((
                    "step",
                    CondGlowStep(
                        x_hw=(hx, wx), x_channels=cx,
                        x_hidden_channels=self.x_hidden_channels,
                        x_hidden_size=self.x_hidden_size,
                        y_channels=c, y_hw=(h, w),
                        y_hidden_channels=self.y_hidden_channels,
                    ),
                ))
                shapes.append((c, h, w))
            if level < self.num_levels - 1:
                layers.append(("split", Split2d(num_channels=c)))
                c = c // 2
                shapes.append((c, h, w))
        self.layer_kinds = tuple(k for k, _ in layers)
        self.layer_mods = [m for _, m in layers if m is not None]
        self.final_shape = shapes[-1]
        if self.learn_top:
            fc, fh, fw = shapes[-1]
            self.top_mean = self.param("top_mean", nn.initializers.zeros,
                                       (1, fh, fw, fc))
            self.top_logs = self.param("top_logs", nn.initializers.zeros,
                                       (1, fh, fw, fc))

    def _prior(self, z):
        if self.learn_top:
            return self.top_mean, self.top_logs
        return jnp.zeros_like(z), jnp.zeros_like(z)

    def _modules_in_order(self):
        mods = iter(self.layer_mods)
        out = []
        for kind in self.layer_kinds:
            out.append((kind, None if kind == "squeeze" else next(mods)))
        return out

    def encode(self, x, y, logdet):
        for kind, mod in self._modules_in_order():
            if kind == "squeeze":
                y = squeeze2d(y)
            elif kind == "split":
                y, logdet = mod(y, logdet, reverse=False)
            else:
                y, logdet = mod(x, y, logdet, reverse=False)
        return y, logdet

    def decode(self, x, y, logdet, eps=None):
        for kind, mod in reversed(self._modules_in_order()):
            if kind == "squeeze":
                y = unsqueeze2d(y)
            elif kind == "split":
                y, logdet = mod(y, logdet, reverse=True, eps=eps)
            else:
                y, logdet = mod(x, y, logdet, reverse=True)
        return y, logdet

    def __call__(self, x: Array, y: Array):
        """(z, nll): nll in bits/dim incl. the −log(n_bins)·D dequantisation
        constant (`nf/cglow/CGlowModel.py:167-176`)."""
        dims = y.shape[-3] * y.shape[-2] * y.shape[-1]
        logdet = jnp.full(y.shape[:1], -math.log(self.y_bins) * dims)
        z, objective = self.encode(x, y, logdet)
        mean, logs = self._prior(z)
        objective = objective + gaussian_logp(mean, logs, z)
        nll = -objective / (math.log(2.0) * dims)
        return z, nll
