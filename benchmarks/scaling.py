"""Particle-throughput scaling harness: 1 chip → N devices.

Measures full-train-step throughput across mesh shapes and reports scaling
efficiency (the BASELINE.md north-star: ≥80% from 1 chip to N hosts).

On real multi-chip hardware run as-is; on a single-host dev box it uses the
virtual CPU mesh (`--virtual 8`) which validates the collective layout but
NOT real ICI bandwidth.

    python benchmarks/scaling.py                 # real devices
    python benchmarks/scaling.py --virtual 8     # 8 virtual CPU devices
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices")
    p.add_argument("--particles", type=int, default=2048)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=10)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from nfdpf_tpu.train import Trainer

    n_dev = jax.device_count()
    cfg = DPFConfig(
        num_particles=args.particles, sequence_length=args.seq_len,
        batch_size=args.batch, resampler_type="ot", max_iter=20,
        measurement="cos",
    )

    def make_batch(key, b):
        ks = jax.random.split(key, 3)
        t = cfg.sequence_length
        return {
            "image": jax.random.uniform(ks[0], (b, t, 128, 128, 3)),
            "state": jax.random.normal(ks[1], (b, t, 4)) * 10,
            "start_state": jax.random.normal(ks[2], (b, 4)) * 10,
        }

    def measure(mesh):
        from bench import scan_step_time

        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        b = args.batch
        batch = make_batch(jax.random.PRNGKey(1), b)
        if mesh is not None:
            state = replicate(state, mesh)
            batch = shard_batch(batch, mesh)
        # in-program scan timing (see bench.py: per-dispatch timing is
        # unsound through the remote-chip tunnel; on local CPU it just
        # amortises dispatch overhead)
        dt = scan_step_time(trainer, state, batch, iters=args.iters,
                            repeats=2, warmup=1)
        return b * cfg.num_particles * cfg.sequence_length / dt

    results = {}
    base = measure(None)
    results["1_device"] = base
    sizes = [s for s in (2, 4, 8) if s <= n_dev]
    for s in sizes:
        particle = 2 if s % 2 == 0 else 1
        mesh = make_mesh(data=s // particle, particle=particle,
                         devices=jax.devices()[:s])
        rate = measure(mesh)
        results[f"{s}_devices"] = rate
        results[f"{s}_devices_efficiency"] = rate / (base * s)
    print(json.dumps({k: round(v, 1) if "efficiency" not in k else round(v, 3)
                      for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
