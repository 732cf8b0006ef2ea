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


class ObservationEncoder(nn.Module):
    """5× (Conv k4 s2 p1 → ReLU → BN) 3→16→32→64→128→256 over 128²→4²,
    flatten, Dense→out_features (`model/models.py:10-60`).

    out_features = hidden_size (32) or 192 for the CGLOW variant.
    """

    out_features: int = 32
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = x.astype(self.compute_dtype)
        for feats in (16, 32, 64, 128, 256):
            x = nn.Conv(feats, (4, 4), strides=2, padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.compute_dtype)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.compute_dtype)(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.Dense(self.out_features, dtype=self.compute_dtype)(x)
        return x.astype(jnp.float32)


class ObservationDecoder(nn.Module):
    """Mirror deconv stack back to 128×128×3 + Sigmoid
    (`model/models.py:62-117`; final BatchNorm before the Sigmoid is kept).

    in_features = hidden_size or 192 (CGLOW).
    """

    in_features: int = 32
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        z = z.astype(self.compute_dtype)
        x = nn.Dense(256 * 4 * 4, dtype=self.compute_dtype)(z)
        x = x.reshape(x.shape[:-1] + (4, 4, 256))
        for feats in (128, 64, 32, 16):
            x = nn.ConvTranspose(feats, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=self.compute_dtype)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.compute_dtype)(x)
        x = nn.ConvTranspose(3, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, dtype=self.compute_dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.compute_dtype)(x)
        return nn.sigmoid(x).astype(jnp.float32)


class ParticleEncoder(nn.Module):
    """MLP state(2)→16→32→out mapping particles into observation-feature
    space (`model/models.py:130-150`).  Shape-polymorphic: applied directly
    on (B, N, d) without the reference's flatten."""

    out_features: int = 32

    @nn.compact
    def __call__(self, s: Array) -> Array:
        s = nn.Dense(16)(s)
        s = nn.relu(s)
        s = nn.Dense(32)(s)
        s = nn.relu(s)
        return nn.Dense(self.out_features)(s)


class LikelihoodNet(nn.Module):
    """MLP 2·hidden→64→64→1 + Sigmoid for `--measurement NN`
    (`model/models.py:119-128`)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(64)(x)
        x = nn.relu(x)
        x = nn.Dense(64)(x)
        x = nn.relu(x)
        x = nn.Dense(1)(x)
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
