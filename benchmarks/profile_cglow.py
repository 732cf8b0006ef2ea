"""Locate the CGLOW step-time bottleneck on the real chip (VERDICT r2 #7).

Times, with the in-program-scan methodology from BASELINE.md ("Measurement
methodology"), forward+backward of:
  - the full CGLOW measurement (B·N particles)
  - each sub-block in isolation: the three conditioning towers, the batched
    logabsdet, the 1×1-conv einsum, the affine-coupling conv net
  - the full train step with measurement=CGLOW vs measurement=cos
    (difference = end-to-end CGLOW cost in context)

    python benchmarks/profile_cglow.py --batch 16 --particles 100
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timed(name, fn, *args, iters=20):
    """One jitted lax.scan of `iters` applications; final value fetched as the
    completion barrier (dispatch-safe on the tunnel)."""
    @jax.jit
    def loop(xs):
        def body(c, _):
            # carry-dependent input perturbation: defeats loop-invariant code
            # motion (otherwise XLA hoists the whole body out of the scan and
            # the "loop" times a single add)
            pert = jax.tree_util.tree_map(
                lambda a: a + c * 1e-20
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                xs,
            )
            out = fn(*pert)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return c + s * 1e-20, None
        c, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return c
    loop(args).block_until_ready()          # compile
    t0 = time.perf_counter()
    loop(args).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.3f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--particles", type=int, default=100)
    args = p.parse_args()

    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.models.cglow import (
        CondGlowModel, ConditioningNet, CondAffineCoupling,
    )
    from nfdpf_tpu.models.measurement import build_measurement_model
    from nfdpf_tpu.ops import linalg

    bn = args.batch * args.particles
    key = jax.random.PRNGKey(0)
    kx, ky, kp, ke = jax.random.split(key, 4)
    x = jax.random.normal(kx, (bn, 8, 8, 3))
    y = jax.random.normal(ky, (bn, 8, 8, 3))

    print(f"devices: {jax.devices()}  B={args.batch} N={args.particles} "
          f"BN={bn}")

    # --- sub-blocks ---
    tower = ConditioningNet((8, 8), 3, 8, 16, 24)
    tw = tower.init(kp, x)
    timed("tower fwd (1 of 3)", lambda v, a: tower.apply(v, a), tw, x)
    timed("tower fwd+bwd",
          jax.grad(lambda v, a: jnp.sum(tower.apply(v, a)) ** 2), tw, x)

    w = jax.random.normal(ke, (bn, 12, 12)) * 0.1 + jnp.eye(12)
    timed("logabsdet fwd", linalg.logabsdet, w)
    timed("logabsdet fwd+bwd",
          jax.grad(lambda m: jnp.sum(linalg.logabsdet(m))), w)
    timed("inv fwd", linalg.inv, w)

    ysq = jax.random.normal(ky, (bn, 4, 4, 12))
    timed("1x1 einsum fwd",
          lambda a, m: jnp.einsum("bhwi,bki->bhwk", a, m), ysq, w)

    coup = CondAffineCoupling((8, 8), 3, 6, (4, 4), 8)
    cw = coup.init(kp, x, ysq, jnp.zeros(bn))
    timed("coupling fwd",
          lambda v, a, b: coup.apply(v, a, b, jnp.zeros(bn)), cw, x, ysq)

    # --- full CGLOW density fwd/bwd ---
    glow = CondGlowModel()
    gw = glow.init(kp, x, y)
    timed("CondGlowModel fwd", lambda v, a, b: glow.apply(v, a, b)[1],
          gw, x, y)
    timed("CondGlowModel fwd+bwd",
          jax.grad(lambda v, a, b: jnp.sum(glow.apply(v, a, b)[1])),
          gw, x, y)

    # --- measurement in context ---
    for meas in ("CGLOW", "cos"):
        cfg = DPFConfig(measurement=meas, batch_size=args.batch,
                        num_particles=args.particles)
        m = build_measurement_model(cfg)
        enc_dim = cfg.glow_ctx_features if meas == "CGLOW" else cfg.hidden_size
        enc = jax.random.normal(ke, (args.batch, enc_dim))
        parts = jax.random.normal(kp, (args.batch, args.particles, 2)) * 10
        mw = m.init(key, enc, parts)
        timed(f"measurement[{meas}] fwd",
              lambda v, a, b: m.apply(v, a, b), mw, enc, parts)
        timed(f"measurement[{meas}] fwd+bwd",
              jax.grad(lambda v, a, b: jnp.sum(m.apply(v, a, b))),
              mw, enc, parts)


if __name__ == "__main__":
    main()
