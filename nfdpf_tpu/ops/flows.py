"""Normalizing-flow library (TPU-native, Flax linen).

Capability parity with `/root/reference/nf/flows.py` and `nf/models.py`:
affine coupling (RealNVP) with optional conditioning, MAF, ActNorm,
LU-parameterised invertible linear ("1x1 conv"), planar, radial, and
rational-quadratic neural spline flows (autoregressive + coupling), plus flow
composers with diagonal-Gaussian priors.

Design differences from the reference (deliberate, TPU-first):
  * every flow is shape-polymorphic over leading batch axes ``(..., d)`` —
    the reference's flatten-to-``(B·N, d)`` reshapes are unnecessary;
  * conditional and unconditional couplings are one module (``ctx=None``);
  * no in-place buffer mutation (the reference caches ``W_inv`` at first
    inverse call, `nf/flows.py:336-341`); we recompute the LU solve, which XLA
    folds into the graph;
  * reference latent bugs are NOT reproduced: log-det device placement
    (`nf/flows.py:261,274`), non-leaf `.to(device)` parameters
    (`nf/flows.py:322-325`), and `Radial.reset_parameters` never being called
    (`nf/flows.py:75-84` — we initialise properly).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nfdpf_tpu.ops.rqs import unconstrained_rqs


Array = jax.Array


class FCNN(nn.Module):
    """3-layer tanh MLP conditioner (`nf/flows.py:101-114`).

    ``init_std`` implements the reference's ``zero_initialization(var)``
    (`nf/flows.py:131-153`): weights ~ N(0, std²) with std = var arg (the
    reference passes 0.01 to `init.normal_(std=var)`), biases zero.
    """

    out_dim: int
    hidden_dim: int = 8
    init_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.init_std is not None:
            kinit = nn.initializers.normal(stddev=self.init_std)
        else:
            kinit = nn.initializers.lecun_normal()
        x = nn.Dense(self.hidden_dim, kernel_init=kinit)(x)
        x = jnp.tanh(x)
        x = nn.Dense(self.hidden_dim, kernel_init=kinit)(x)
        x = jnp.tanh(x)
        return nn.Dense(self.out_dim, kernel_init=kinit)(x)


class AffineCoupling(nn.Module):
    """RealNVP block: two alternating affine couplings over a half split.

    Unifies `RealNVP` (`nf/flows.py:117-179`) and `RealNVP_cond`
    (`nf/flows.py:181-239`): when ``ctx`` is given it is concatenated to the
    conditioner input of every sub-network.

    forward:  upper' = t1(lower⊕ctx) + upper·exp(s1(lower⊕ctx));
              lower' = t2(upper'⊕ctx) + lower·exp(s2(upper'⊕ctx))
    log_det = Σ s1 + Σ s2.
    """

    dim: int
    hidden_dim: int = 8
    init_std: Optional[float] = 0.01

    def setup(self):
        half = self.dim // 2
        self.t1 = FCNN(half, self.hidden_dim, self.init_std)
        self.s1 = FCNN(half, self.hidden_dim, self.init_std)
        self.t2 = FCNN(half, self.hidden_dim, self.init_std)
        self.s2 = FCNN(half, self.hidden_dim, self.init_std)

    def _split(self, x: Array) -> Tuple[Array, Array]:
        half = self.dim // 2
        return x[..., :half], x[..., half:]

    @staticmethod
    def _cat(lower: Array, ctx: Optional[Array]) -> Array:
        return lower if ctx is None else jnp.concatenate([lower, ctx], axis=-1)

    def __call__(self, x: Array, ctx: Optional[Array] = None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx: Optional[Array] = None):
        lower, upper = self._split(x)
        t1 = self.t1(self._cat(lower, ctx))
        s1 = self.s1(self._cat(lower, ctx))
        upper = t1 + upper * jnp.exp(s1)
        t2 = self.t2(self._cat(upper, ctx))
        s2 = self.s2(self._cat(upper, ctx))
        lower = t2 + lower * jnp.exp(s2)
        z = jnp.concatenate([lower, upper], axis=-1)
        log_det = jnp.sum(s1, axis=-1) + jnp.sum(s2, axis=-1)
        return z, log_det

    def inverse(self, z: Array, ctx: Optional[Array] = None):
        lower, upper = self._split(z)
        t2 = self.t2(self._cat(upper, ctx))
        s2 = self.s2(self._cat(upper, ctx))
        lower = (lower - t2) * jnp.exp(-s2)
        t1 = self.t1(self._cat(lower, ctx))
        s1 = self.s1(self._cat(lower, ctx))
        upper = (upper - t1) * jnp.exp(-s1)
        x = jnp.concatenate([lower, upper], axis=-1)
        log_det = -jnp.sum(s1, axis=-1) - jnp.sum(s2, axis=-1)
        return x, log_det


class MAF(nn.Module):
    """Masked autoregressive flow (`nf/flows.py:241-284`).

    Per-dimension conditioners; ``dim`` is tiny (2) so the static Python loop
    unrolls into a handful of fused XLA ops.
    """

    dim: int
    hidden_dim: int = 8

    def setup(self):
        self.initial_param = self.param(
            "initial_param",
            nn.initializers.uniform(scale=2 * math.sqrt(0.5)),
            (2,),
        )
        self.layers = [FCNN(2, self.hidden_dim) for _ in range(self.dim - 1)]

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx=None):
        # initial_param init: uniform(-sqrt(.5), sqrt(.5)) like the reference;
        # flax's uniform is [0, scale) so shift by -scale/2.
        init = self.initial_param - math.sqrt(0.5)
        zs = []
        log_det = jnp.zeros(x.shape[:-1])
        for i in range(self.dim):
            if i == 0:
                mu, alpha = init[0], init[1]
            else:
                out = self.layers[i - 1](x[..., :i])
                mu, alpha = out[..., 0], out[..., 1]
            zs.append((x[..., i] - mu) / jnp.exp(alpha))
            log_det = log_det - alpha
        z = jnp.stack(zs, axis=-1)
        return jnp.flip(z, axis=-1), log_det

    def inverse(self, z: Array, ctx=None):
        init = self.initial_param - math.sqrt(0.5)
        z = jnp.flip(z, axis=-1)
        xs = []
        log_det = jnp.zeros(z.shape[:-1])
        for i in range(self.dim):
            if i == 0:
                mu, alpha = init[0], init[1]
            else:
                out = self.layers[i - 1](jnp.stack(xs, axis=-1))
                mu, alpha = out[..., 0], out[..., 1]
            xs.append(mu + jnp.exp(alpha) * z[..., i])
            log_det = log_det + alpha
        return jnp.stack(xs, axis=-1), log_det


class ActNorm(nn.Module):
    """Per-dimension affine ``z = x·e^{logσ} + μ`` (`nf/flows.py:287-307`)."""

    dim: int

    def setup(self):
        self.mu = self.param("mu", nn.initializers.zeros, (self.dim,))
        self.log_sigma = self.param("log_sigma", nn.initializers.zeros, (self.dim,))

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx=None):
        z = x * jnp.exp(self.log_sigma) + self.mu
        log_det = jnp.broadcast_to(jnp.sum(self.log_sigma), x.shape[:-1])
        return z, log_det

    def inverse(self, z: Array, ctx=None):
        x = (z - self.mu) * jnp.exp(-self.log_sigma)
        log_det = jnp.broadcast_to(-jnp.sum(self.log_sigma), z.shape[:-1])
        return x, log_det


def _lu_qr_init(key, dim):
    """Fixed permutation + L/U/S factors of a random orthogonal matrix.

    Mirrors `nf/flows.py:316-326` but with proper parameter registration
    (the reference's `.to(device)` pattern silently de-registers them).
    """
    import scipy.linalg as sla

    w = np.asarray(jax.random.normal(key, (dim, dim)))
    q, _ = np.linalg.qr(w)
    p, l, u = sla.lu(q)
    return (
        jnp.asarray(p, jnp.float32),
        jnp.asarray(l, jnp.float32),
        jnp.asarray(np.diag(u), jnp.float32),
        jnp.asarray(np.triu(u, 1), jnp.float32),
    )


class InvertibleLinear(nn.Module):
    """LU-parameterised invertible linear map ("1x1 conv", `nf/flows.py:310-344`).

    ``z = x·(P L (U + diag(S)))``; log-det = Σ log|S|.  The permutation P is a
    fixed (non-trainable) variable; L's strict lower triangle, U's strict
    upper triangle, and S are trainable.
    """

    dim: int

    def setup(self):
        d = self.dim
        init = _lu_qr_init(jax.random.PRNGKey(0), d)  # deterministic structure

        self.p_mat = self.variable(
            "constants", "P", lambda: init[0]
        )
        self.l_param = self.param("L", lambda k, s: init[1], (d, d))
        self.s_param = self.param("S", lambda k, s: init[2], (d,))
        self.u_param = self.param("U", lambda k, s: init[3], (d, d))

    def _w(self):
        d = self.dim
        l = jnp.tril(self.l_param, -1) + jnp.eye(d)
        u = jnp.triu(self.u_param, 1)
        return self.p_mat.value @ l @ (u + jnp.diag(self.s_param))

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx=None):
        z = x @ self._w()
        log_det = jnp.broadcast_to(
            jnp.sum(jnp.log(jnp.abs(self.s_param))), x.shape[:-1]
        )
        return z, log_det

    def inverse(self, z: Array, ctx=None):
        w_inv = jnp.linalg.inv(self._w())
        x = z @ w_inv
        log_det = jnp.broadcast_to(
            -jnp.sum(jnp.log(jnp.abs(self.s_param))), z.shape[:-1]
        )
        return x, log_det


class Planar(nn.Module):
    """Planar flow ``z = x + u·tanh(wᵀx + b)`` (`nf/flows.py:22-64`).

    Forward-only (no algebraic inverse), with the tanh invertibility
    correction on ``u``.
    """

    dim: int

    def setup(self):
        bound = math.sqrt(1.0 / self.dim)
        uinit = nn.initializers.uniform(scale=2 * bound)
        self.w = self.param("w", uinit, (self.dim,))
        self.u = self.param("u", uinit, (self.dim,))
        self.b = self.param("b", uinit, (1,))

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx=None):
        bound = math.sqrt(1.0 / self.dim)
        w = self.w - bound
        u = self.u - bound
        b = self.b - bound
        wu = jnp.dot(w, u)
        scal = jnp.log1p(jnp.exp(wu)) - wu - 1.0
        u_hat = u + scal * w / jnp.sum(w**2)
        lin = jnp.sum(x * w, axis=-1, keepdims=True) + b
        z = x + u_hat * jnp.tanh(lin)
        phi = (1.0 - jnp.tanh(lin) ** 2) * w
        log_det = jnp.log(jnp.abs(1.0 + jnp.sum(phi * u_hat, axis=-1)) + 1e-4)
        return z, log_det

    def inverse(self, z, ctx=None):
        raise NotImplementedError("Planar flow has no algebraic inverse.")


class Radial(nn.Module):
    """Radial flow ``z = x + β h(α, r)(x − x0)`` (`nf/flows.py:67-98`).

    Unlike the reference, parameters ARE initialised (the reference defines
    ``reset_parameters`` but never calls it, leaving garbage memory).
    """

    dim: int

    def setup(self):
        bound = math.sqrt(1.0 / self.dim)
        uinit = nn.initializers.uniform(scale=2 * bound)
        self.x0 = self.param("x0", uinit, (self.dim,))
        self.log_alpha = self.param("log_alpha", uinit, (1,))
        self.beta = self.param("beta", uinit, (1,))

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx=None):
        bound = math.sqrt(1.0 / self.dim)
        x0 = self.x0 - bound
        log_alpha = self.log_alpha[0] - bound
        beta_raw = self.beta[0] - bound
        n = x.shape[-1]
        # reference computes a single global norm over the whole batch tensor
        # (`nf/flows.py:91`); we keep the per-sample radius, which is the
        # standard Rezende-Mohamed form (documented deviation).
        r = jnp.linalg.norm(x - x0, axis=-1, keepdims=True)
        h = 1.0 / (jnp.exp(log_alpha) + r)
        beta = -jnp.exp(log_alpha) + jnp.log1p(jnp.exp(beta_raw))
        z = x + beta * h * (x - x0)
        bh = beta * h[..., 0]
        log_det = (n - 1) * jnp.log1p(bh) + jnp.log1p(
            bh - beta * r[..., 0] / (jnp.exp(log_alpha) + r[..., 0]) ** 2
        )
        return z, log_det


class NSFAutoregressive(nn.Module):
    """Neural spline flow, autoregressive (`nf/flows.py:347-401`).  K=5, B=3."""

    dim: int
    K: int = 5
    B: float = 3.0
    hidden_dim: int = 8

    def setup(self):
        self.init_param = self.param(
            "init_param", nn.initializers.uniform(scale=1.0), (3 * self.K - 1,)
        )
        self.layers = [
            FCNN(3 * self.K - 1, self.hidden_dim) for _ in range(self.dim - 1)
        ]

    def _params_for(self, cond: Optional[Array], batch_shape):
        if cond is None:
            out = jnp.broadcast_to(
                self.init_param - 0.5, batch_shape + (3 * self.K - 1,)
            )
        else:
            out = self.layers[cond.shape[-1] - 1](cond)
        w, h, d = jnp.split(out, [self.K, 2 * self.K], axis=-1)
        w = 2 * self.B * jax.nn.softmax(w, axis=-1)
        h = 2 * self.B * jax.nn.softmax(h, axis=-1)
        d = jax.nn.softplus(d)
        return w, h, d

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx=None):
        zs, log_det = [], jnp.zeros(x.shape[:-1])
        for i in range(self.dim):
            cond = None if i == 0 else x[..., :i]
            w, h, d = self._params_for(cond, x.shape[:-1])
            zi, ld = unconstrained_rqs(x[..., i], w, h, d, inverse=False,
                                       tail_bound=self.B)
            zs.append(zi)
            log_det = log_det + ld
        return jnp.stack(zs, axis=-1), log_det

    def inverse(self, z: Array, ctx=None):
        xs, log_det = [], jnp.zeros(z.shape[:-1])
        for i in range(self.dim):
            cond = None if i == 0 else jnp.stack(xs, axis=-1)
            w, h, d = self._params_for(cond, z.shape[:-1])
            xi, ld = unconstrained_rqs(z[..., i], w, h, d, inverse=True,
                                       tail_bound=self.B)
            xs.append(xi)
            log_det = log_det + ld
        return jnp.stack(xs, axis=-1), log_det


class NSFCoupling(nn.Module):
    """Neural spline flow, coupling layer (`nf/flows.py:404-458`)."""

    dim: int
    K: int = 5
    B: float = 3.0
    hidden_dim: int = 8

    def setup(self):
        half = self.dim // 2
        self.f1 = FCNN((3 * self.K - 1) * half, self.hidden_dim)
        self.f2 = FCNN((3 * self.K - 1) * half, self.hidden_dim)

    def _spline_params(self, net, cond: Array):
        half = self.dim // 2
        out = net(cond).reshape(cond.shape[:-1] + (half, 3 * self.K - 1))
        w, h, d = jnp.split(out, [self.K, 2 * self.K], axis=-1)
        w = 2 * self.B * jax.nn.softmax(w, axis=-1)
        h = 2 * self.B * jax.nn.softmax(h, axis=-1)
        d = jax.nn.softplus(d)
        return w, h, d

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx=None):
        half = self.dim // 2
        lower, upper = x[..., :half], x[..., half:]
        w, h, d = self._spline_params(self.f1, lower)
        upper, ld = unconstrained_rqs(upper, w, h, d, inverse=False,
                                      tail_bound=self.B)
        log_det = jnp.sum(ld, axis=-1)
        w, h, d = self._spline_params(self.f2, upper)
        lower, ld = unconstrained_rqs(lower, w, h, d, inverse=False,
                                      tail_bound=self.B)
        log_det = log_det + jnp.sum(ld, axis=-1)
        return jnp.concatenate([lower, upper], axis=-1), log_det

    def inverse(self, z: Array, ctx=None):
        half = self.dim // 2
        lower, upper = z[..., :half], z[..., half:]
        w, h, d = self._spline_params(self.f2, upper)
        lower, ld = unconstrained_rqs(lower, w, h, d, inverse=True,
                                      tail_bound=self.B)
        log_det = jnp.sum(ld, axis=-1)
        w, h, d = self._spline_params(self.f1, lower)
        upper, ld = unconstrained_rqs(upper, w, h, d, inverse=True,
                                      tail_bound=self.B)
        log_det = log_det + jnp.sum(ld, axis=-1)
        return jnp.concatenate([lower, upper], axis=-1), log_det


class FlowChain(nn.Module):
    """Flow composer with diagonal-Gaussian prior.

    Mirrors `nf/models.py:5-66` (both conditional and unconditional
    composers).  ``forward`` maps data → latent accumulating log-det and
    returns the prior log-prob of z; ``inverse`` applies flows reversed.

    Construction is declarative: ``flow_defs`` is a sequence of already
    constructed (sub)modules; linen handles parameter scoping.
    """

    flows: Sequence[nn.Module]
    prior_mean: float = 0.0
    prior_std: float = 1.0

    def _prior_logprob(self, z: Array) -> Array:
        d = z.shape[-1]
        var = self.prior_std**2
        return (
            -0.5 * d * math.log(2 * math.pi)
            - 0.5 * d * math.log(var)
            - 0.5 * jnp.sum((z - self.prior_mean) ** 2, axis=-1) / var
        )

    def __call__(self, x, ctx=None):
        return self.forward(x, ctx)

    def forward(self, x: Array, ctx: Optional[Array] = None):
        log_det = jnp.zeros(x.shape[:-1])
        for flow in self.flows:
            x, ld = flow.forward(x, ctx)
            log_det = log_det + ld
        return x, self._prior_logprob(x), log_det

    def inverse(self, z: Array, ctx: Optional[Array] = None):
        log_det = jnp.zeros(z.shape[:-1])
        for flow in reversed(self.flows):
            z, ld = flow.inverse(z, ctx)
            log_det = log_det + ld
        return z, log_det

    def sample_with_dim(self, key: jax.Array, sample_shape, dim: int,
                        ctx: Optional[Array] = None):
        """`nf/models.py:32-35,63-66`: draw prior z, push through inverse."""
        z = self.prior_mean + self.prior_std * jax.random.normal(
            key, tuple(sample_shape) + (dim,)
        )
        x, _ = self.inverse(z, ctx)
        return x


def realnvp_chain(n_blocks: int, dim: int, hidden_dim: int = 8,
                  init_std: float = 0.01, prior_mean: float = 0.0,
                  prior_std: float = 1.0) -> FlowChain:
    """`build_conditional_nf` / `build_dyn_nf` analog (`model/models.py:161-189`):
    n RealNVP blocks, zero-ish init (std 0.01 → identity-at-init flow),
    isotropic Gaussian prior."""
    return FlowChain(
        flows=[AffineCoupling(dim=dim, hidden_dim=hidden_dim, init_std=init_std)
               for _ in range(n_blocks)],
        prior_mean=prior_mean,
        prior_std=prior_std,
    )
