"""NN building blocks: observation encoder/decoder, particle encoder, heads.

TPU-native counterparts of `/root/reference/model/models.py:10-159`.  Images
are NHWC (XLA's preferred conv layout on TPU) — the reference's NCHW permute
(`DPFs.py:101`) disappears.  Conv compute can run in bfloat16 (params stay
f32) via ``compute_dtype``; the MXU does the heavy lifting either way.

Layer order matches the reference exactly: Conv → ReLU → BatchNorm
(`model/models.py:12-14`), with torch's running-stat decay (momentum=0.9 in
Flax terms = `torch.nn.BatchNorm2d` default momentum 0.1) — Flax's 0.99
default makes eval stats lag ~100 steps behind the weights, visibly
inflating val RMSE on short training budgets.
BatchNorm batch statistics are computed over
whatever leading batch the encoder is applied to; the filter engine applies
the encoder ONCE over all (B·T) frames instead of per-step over B frames
(documented deviation — one big MXU-friendly conv launch instead of T small
ones; same parameters, different BN batch statistics during training).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def torch_uniform(bound: float):
    """U(±bound) initializer.

    torch's default ``nn.Linear``/``nn.Conv2d`` init is
    ``kaiming_uniform_(a=√5)`` for the weight and ``U(±1/√fan_in)`` for the
    bias; with a=√5 the weight bound √(6/((1+a²)·fan_in)) also reduces to
    1/√fan_in.  The reference inherits these defaults everywhere
    (`model/models.py:10-159`), whereas Flax defaults to lecun-normal
    kernels and zero biases — an init-distribution gap that dominates
    short-budget training (round-2 head-to-head).
    """

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _dense(feats, fan_in, torch_init, dtype=None):
    """Dense layer whose init matches torch ``nn.Linear`` when requested."""
    if torch_init:
        b = float(fan_in) ** -0.5
        return nn.Dense(feats, dtype=dtype, kernel_init=torch_uniform(b),
                        bias_init=torch_uniform(b))
    return nn.Dense(feats, dtype=dtype)


class ObservationEncoder(nn.Module):
    """5× (Conv k4 s2 p1 → ReLU → BN) 3→16→32→64→128→256 over 128²→4²,
    flatten, Dense→out_features (`model/models.py:10-60`).

    out_features = hidden_size (32) or 192 for the CGLOW variant.
    """

    out_features: int = 32
    compute_dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = x.astype(self.compute_dtype)
        in_feats = 3
        for feats in (16, 32, 64, 128, 256):
            kw = {}
            if self.torch_init:  # torch Conv2d fan_in = in_ch·kh·kw
                kw["kernel_init"] = torch_uniform((in_feats * 16) ** -0.5)
            x = nn.Conv(feats, (4, 4), strides=2, padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.compute_dtype, **kw)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.compute_dtype)(x)
            in_feats = feats
        x = x.reshape(x.shape[:-3] + (-1,))
        x = _dense(self.out_features, 256 * 4 * 4, self.torch_init,
                   dtype=self.compute_dtype)(x)
        return x.astype(jnp.float32)


class ObservationDecoder(nn.Module):
    """Mirror deconv stack back to 128×128×3 + Sigmoid
    (`model/models.py:62-117`; final BatchNorm before the Sigmoid is kept).

    in_features = hidden_size or 192 (CGLOW).
    """

    in_features: int = 32
    compute_dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        z = z.astype(self.compute_dtype)
        x = _dense(256 * 4 * 4, self.in_features, self.torch_init,
                   dtype=self.compute_dtype)(z)
        x = x.reshape(x.shape[:-1] + (4, 4, 256))

        def deconv(feats):
            kw = {}
            if self.torch_init:
                # torch ConvTranspose2d weight is (in, out, kh, kw) and
                # fan_in is computed from dim 1 ⇒ fan_in = out_ch·kh·kw
                kw["kernel_init"] = torch_uniform((feats * 16) ** -0.5)
            return nn.ConvTranspose(
                feats, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.compute_dtype, **kw)

        for feats in (128, 64, 32, 16):
            x = deconv(feats)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.compute_dtype)(x)
        x = deconv(3)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.compute_dtype)(x)
        return nn.sigmoid(x).astype(jnp.float32)


class ParticleEncoder(nn.Module):
    """MLP state(2)→16→32→out mapping particles into observation-feature
    space (`model/models.py:130-150`).  Shape-polymorphic: applied directly
    on (B, N, d) without the reference's flatten."""

    out_features: int = 32
    torch_init: bool = False

    @nn.compact
    def __call__(self, s: Array) -> Array:
        d = s.shape[-1]
        s = _dense(16, d, self.torch_init)(s)
        s = nn.relu(s)
        s = _dense(32, 16, self.torch_init)(s)
        s = nn.relu(s)
        return _dense(self.out_features, 32, self.torch_init)(s)


class LikelihoodNet(nn.Module):
    """MLP 2·hidden→64→64→1 + Sigmoid for `--measurement NN`
    (`model/models.py:119-128`)."""

    torch_init: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        x = _dense(64, d, self.torch_init)(x)
        x = nn.relu(x)
        x = _dense(64, 64, self.torch_init)(x)
        x = nn.relu(x)
        x = _dense(1, 64, self.torch_init)(x)
        return nn.sigmoid(x)


class TransitionMLP(nn.Module):
    """Learned transition state→64→64→state (`model/models.py:152-159`).

    Built-but-unused in the reference's filtering path (`DPFs.py:67`,
    `--Dyn_nn` never consumed); provided for capability parity.
    """

    state_dim: int = 2

    @nn.compact
    def __call__(self, s: Array) -> Array:
        x = nn.Dense(64)(s)
        x = nn.relu(x)
        x = nn.Dense(64)(x)
        x = nn.relu(x)
        return nn.Dense(self.state_dim)(x)
