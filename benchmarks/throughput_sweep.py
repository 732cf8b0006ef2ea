"""Particle-throughput sweep: N=100 → 10k, f32 vs bf16 conv compute.

The BASELINE.md north-star asks for particle-transitions/sec/chip at
100–10k particles.  This sweeps the full-train-step workload (filter
forward + losses + backward + Adam) over particle counts and the conv
compute dtype, printing one JSON object.

    python benchmarks/throughput_sweep.py --particles 100 1000 10000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(cfg, batch_size, warmup, iters):
    import jax

    from nfdpf_tpu.train import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    t = cfg.sequence_length
    batch = {
        "image": jax.random.uniform(
            ks[0], (batch_size, t, cfg.width, cfg.width, 3)
        ),
        "state": jax.random.normal(ks[1], (batch_size, t, 4)) * 10,
        "start_state": jax.random.normal(ks[2], (batch_size, 4)) * 10,
    }
    # in-program scan timing, shared with bench.py: the tunnel's
    # block_until_ready is unreliable for individually dispatched steps
    from bench import scan_step_time

    dt = scan_step_time(trainer, state, batch, iters=iters, repeats=3,
                        warmup=warmup)
    return batch_size * cfg.num_particles * t / dt, dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, nargs="+",
                   default=[100, 1000, 10000])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=50)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--resampler", default="ot", choices=["ot", "soft"])
    p.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    p.add_argument("--pallas-above", type=int, default=4096,
                   help="use the streaming Pallas Sinkhorn above this N")
    args = p.parse_args()

    sys.path.insert(0, ".")
    from nfdpf_tpu.config import DPFConfig

    results = {}
    for n in args.particles:
        for dtype in args.dtypes:
            cfg = DPFConfig(
                num_particles=n, sequence_length=args.seq_len,
                batch_size=args.batch, resampler_type=args.resampler,
                measurement="cos", compute_dtype=dtype,
                use_pallas=(args.resampler == "ot" and n > args.pallas_above),
            )
            try:
                rate, dt = measure(cfg, args.batch, args.warmup, args.iters)
                results[f"N={n}/{dtype}"] = {
                    "transitions_per_sec": round(rate, 1),
                    "step_ms": round(dt * 1e3, 2),
                }
            except Exception as e:  # noqa: BLE001
                results[f"N={n}/{dtype}"] = {"error": repr(e)[:200]}
            print(f"# N={n} {dtype}: {results[f'N={n}/{dtype}']}",
                  file=sys.stderr, flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
