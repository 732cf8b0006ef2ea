"""On-chip check: streaming Pallas OT vs the dense Sinkhorn, real TPU.

The interpret-mode tests validate semantics on CPU; this validates the
Mosaic lowering of the d-major kernel layout on actual hardware and prints
the max deviation vs the dense path at a size the dense path can still run.

    python benchmarks/pallas_tpu_check.py [--particles 1024] [--batch 4]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--max-iter", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nfdpf_tpu.ops.pallas.sinkhorn_pallas import ot_resample_pallas
    from nfdpf_tpu.ops.sinkhorn import ot_resample

    b, n = args.batch, args.particles
    kp, kw = jax.random.split(jax.random.PRNGKey(0))
    particles = jax.random.normal(kp, (b, n, 2)) * 10
    probs = jax.nn.softmax(jax.random.normal(kw, (b, n)))
    kw_args = dict(eps=0.1, scaling=0.75, threshold=1e-3,
                   max_iter=args.max_iter)

    stream = jax.jit(lambda x, w: ot_resample_pallas(x, w, **kw_args))
    # The streaming kernel accumulates in f32 (preferred_element_type);
    # compare against the dense path at matched f32 matmul precision —
    # at TPU default precision the DENSE path's big T@x / cdist matmuls run
    # with bf16 mantissas and carry ~1e-1 absolute error on ±30 particles.
    with jax.default_matmul_precision("float32"):
        dense = jax.jit(lambda x, w: ot_resample(x, w, **kw_args))

        ps, ws, _ = stream(particles, probs)
        pd, wd, _ = dense(particles, probs)
        ps.block_until_ready()
        err_p = float(jnp.max(jnp.abs(ps - pd)))
        err_w = float(jnp.max(jnp.abs(ws - wd)))
        # gradient path through the value operand of T@x
        g = jax.grad(lambda x: jnp.sum(stream(x, probs)[0] ** 2))(particles)
        gd = jax.grad(lambda x: jnp.sum(dense(x, probs)[0] ** 2))(particles)
        err_g = float(jnp.max(jnp.abs(g - gd)))
    print(f"devices={jax.devices()} B={b} N={n}: "
          f"max|Δparticles|={err_p:.3e} max|Δweights|={err_w:.3e} "
          f"max|Δgrad|={err_g:.3e}")
    assert err_p < 1e-2 and err_w < 1e-6 and err_g < 1e-1, "mismatch"
    print("PALLAS TPU CHECK OK")


if __name__ == "__main__":
    main()
