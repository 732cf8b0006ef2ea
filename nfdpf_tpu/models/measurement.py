"""Measurement models: p(observation | particle) in encoding space.

TPU-native counterparts of the five measurement families in
`/root/reference/model/models.py:206-303`.  Each module takes the
observation encodings (B, h) and particles (B, N, d) and returns per-particle
log-likelihoods (B, N).  All own their particle encoder (as in the
reference, where the shared ``particle_encoder`` is only ever consumed by
the measurement model, `DPFs.py:66-89`).

The per-batch max-subtraction stabilisation of the Gaussian/CRNVP/CGLOW
variants (`model/models.py:252,276,301`) is preserved — under a sharded
particle axis it becomes a cross-shard ``pmax`` (handled by GSPMD when the
particle axis is sharded).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.models.cglow import CondGlowModel
from nfdpf_tpu.models.nets import LikelihoodNet, ParticleEncoder
from nfdpf_tpu.ops.density import cosine_distance
from nfdpf_tpu.ops.flows import realnvp_chain

Array = jax.Array


class CosineMeasurement(nn.Module):
    """``log 1/(1e-7 + cos-distance)`` (`model/models.py:206-219`)."""

    hidden_size: int = 32
    torch_init: bool = False

    def setup(self):
        self.particle_encoder = ParticleEncoder(
            out_features=self.hidden_size, torch_init=self.torch_init)

    def __call__(self, encodings: Array, particles: Array) -> Array:
        e_state = self.particle_encoder(particles)            # (B, N, h)
        e_obs = encodings[:, None, :]
        lik = 1.0 / (1e-7 + cosine_distance(e_obs, e_state))
        return jnp.log(lik)


class NNMeasurement(nn.Module):
    """Sigmoid MLP on concatenated encodings (`model/models.py:221-235`)."""

    hidden_size: int = 32
    torch_init: bool = False

    def setup(self):
        self.particle_encoder = ParticleEncoder(
            out_features=self.hidden_size, torch_init=self.torch_init)
        self.likelihood_net = LikelihoodNet(torch_init=self.torch_init)

    def __call__(self, encodings: Array, particles: Array) -> Array:
        e_state = self.particle_encoder(particles)
        e_obs = jnp.broadcast_to(
            encodings[:, None, :], e_state.shape
        )
        lik = self.likelihood_net(jnp.concatenate([e_obs, e_state], axis=-1))
        return jnp.log(lik[..., 0])


class GaussianMeasurement(nn.Module):
    """``MVN(1·𝟙, 100·I).log_prob(e_obs − e_state)`` with per-batch
    max-subtraction (`model/models.py:237-254`; distribution at `DPFs.py:84-86`)."""

    hidden_size: int = 32
    mean: float = 1.0
    variance: float = 100.0
    torch_init: bool = False

    def setup(self):
        self.particle_encoder = ParticleEncoder(
            out_features=self.hidden_size, torch_init=self.torch_init)

    def __call__(self, encodings: Array, particles: Array) -> Array:
        e_state = self.particle_encoder(particles)
        diff = encodings[:, None, :] - e_state
        h = diff.shape[-1]
        lik = (
            -0.5 * h * math.log(2 * math.pi)
            - 0.5 * h * math.log(self.variance)
            - 0.5 * jnp.sum((diff - self.mean) ** 2, axis=-1) / self.variance
        )
        return lik - jnp.max(lik, axis=-1, keepdims=True)


class CRNVPMeasurement(nn.Module):
    """Conditional-RealNVP density of e_obs given e_state (`model/models.py:256-278`).

    CNF built with prior_std=2.5, ctx = hidden (`DPFs.py:74-77`).  No
    flattening: the flow chain is shape-polymorphic over (B, N).
    """

    hidden_size: int = 32
    n_sequence: int = 2
    flow_hidden_dim: int = 8
    torch_init: bool = False

    def setup(self):
        self.particle_encoder = ParticleEncoder(
            out_features=self.hidden_size, torch_init=self.torch_init)
        self.cnf = realnvp_chain(
            n_blocks=self.n_sequence, dim=self.hidden_size,
            hidden_dim=self.flow_hidden_dim, init_std=0.01, prior_std=2.5,
        )

    def __call__(self, encodings: Array, particles: Array) -> Array:
        e_state = self.particle_encoder(particles)                  # (B,N,h)
        e_obs = jnp.broadcast_to(encodings[:, None, :], e_state.shape)
        _, log_prob_z, log_det = self.cnf.forward(e_obs, e_state)
        lik = log_prob_z + log_det
        return lik - jnp.max(lik, axis=-1, keepdims=True)


class CGlowMeasurement(nn.Module):
    """Conditional-GLOW bits/dim of e_obs given e_state (`model/models.py:280-303`).

    Both encodings are 192-d, reshaped to 8×8×3 (NHWC; reference uses CHW —
    only internal consistency matters since both sides use one layout).
    """

    config: DPFConfig

    def setup(self):
        self.particle_encoder = ParticleEncoder(
            out_features=self.config.glow_ctx_features,
            torch_init=self.config.torch_init,
        )
        self.cglow = CondGlowModel(
            x_size=self.config.x_size,
            y_size=self.config.y_size,
            x_hidden_channels=self.config.x_hidden_channels,
            x_hidden_size=self.config.x_hidden_size,
            y_hidden_channels=self.config.y_hidden_channels,
            flow_depth=self.config.flow_depth,
            num_levels=self.config.num_levels,
            learn_top=self.config.learn_top,
            y_bins=self.config.y_bins,
        )

    def __call__(self, encodings: Array, particles: Array) -> Array:
        b, n, _ = particles.shape
        c, h, w = self.config.x_size
        e_state = self.particle_encoder(particles).reshape(b * n, h, w, c)
        e_obs = jnp.broadcast_to(
            encodings[:, None, :], (b, n, encodings.shape[-1])
        ).reshape(b * n, h, w, c)
        _, nll = self.cglow(e_state, e_obs)
        lik = -nll.reshape(b, n)
        return lik - jnp.max(lik, axis=-1, keepdims=True)


def build_measurement_model(config: DPFConfig) -> nn.Module:
    """Dispatch on `--measurement` (`DPFs.py:74-89`)."""
    kind = config.measurement
    if kind == "cos":
        return CosineMeasurement(hidden_size=config.hidden_size,
                                 torch_init=config.torch_init)
    if kind == "NN":
        return NNMeasurement(hidden_size=config.hidden_size,
                             torch_init=config.torch_init)
    if kind == "gaussian":
        return GaussianMeasurement(hidden_size=config.hidden_size,
                                   torch_init=config.torch_init)
    if kind == "CRNVP":
        return CRNVPMeasurement(
            hidden_size=config.hidden_size, n_sequence=config.n_sequence,
            flow_hidden_dim=config.flow_hidden_dim,
            torch_init=config.torch_init,
        )
    if kind == "CGLOW":
        return CGlowMeasurement(config=config)
    raise ValueError(f"unknown measurement model {kind!r}")
