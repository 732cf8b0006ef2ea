"""Microbenchmark for the CGLOW measurement path (VERDICT r1 #7).

Times value+grad of the CondGlowModel nll over (B*N) rows of (8,8,3) —
exactly the per-timestep work `measurement_model_cglow` does — using the
scan-fused timing methodology from bench.py (K steps in ONE jitted program,
final scalar fetched as the completion barrier).

    python benchmarks/cglow_bench.py [--rows 3200] [--steps 20]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nfdpf_tpu.models.cglow import CondGlowModel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=3200)   # B=32 x N=100
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    model = CondGlowModel()
    key = jax.random.PRNGKey(0)
    kx, ky, kv = jax.random.split(key, 3)
    x = jax.random.normal(kx, (args.rows, 8, 8, 3))
    y = jax.random.normal(ky, (args.rows, 8, 8, 3))
    variables = model.init(kv, x, y)

    def loss_fn(vs, x, y):
        _, nll = model.apply(vs, x, y)
        return jnp.mean(nll)

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def k_steps(vs, x, y):
        def body(carry, _):
            acc, vs = carry
            val, g = grad_fn(vs, x, y)
            # touch the grads so nothing is DCE'd; tiny update keeps the
            # program equivalent to a training step's data flow
            vs = jax.tree_util.tree_map(lambda p, gg: p - 1e-9 * gg, vs, g)
            return (acc + val, vs), None

        (acc, vs), _ = jax.lax.scan(body, (0.0, vs), None, length=args.steps)
        return acc

    # compile + warm
    k_steps(variables, x, y).block_until_ready()
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(k_steps(variables, x, y))
        dt = (time.perf_counter() - t0) / args.steps
        best = min(best, dt)
    rows_per_s = args.rows / best
    print(f"rows={args.rows} steps={args.steps}: "
          f"{best*1e3:.2f} ms/step  ({rows_per_s/1e6:.2f}M rows/s)")


if __name__ == "__main__":
    main()
