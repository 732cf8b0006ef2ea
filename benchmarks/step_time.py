"""Full-train-step time for an arbitrary config (scan-fused methodology).

    python benchmarks/step_time.py --measurement CGLOW --nf-dyn \
        --resampler soft --batch 16 --particles 100 --seq-len 25
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--measurement", default="cos")
    p.add_argument("--nf-dyn", action="store_true")
    p.add_argument("--nf-cond", action="store_true")
    p.add_argument("--resampler", default="ot", choices=["ot", "soft"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--particles", type=int, default=100)
    p.add_argument("--seq-len", type=int, default=25)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--use-pallas", action="store_true",
                   help="fused coupling chain + streaming Sinkhorn kernels")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    import jax

    from bench import scan_step_time
    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.train import Trainer

    cfg = DPFConfig(
        measurement=args.measurement, nf_dyn=args.nf_dyn,
        nf_cond=args.nf_cond, resampler_type=args.resampler,
        batch_size=args.batch, num_particles=args.particles,
        sequence_length=args.seq_len, use_pallas=args.use_pallas,
        compute_dtype=args.compute_dtype,
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    t = cfg.sequence_length
    batch = {
        "image": jax.random.uniform(
            ks[0], (args.batch, t, cfg.width, cfg.width, 3)),
        "state": jax.random.normal(ks[1], (args.batch, t, 4)) * 10,
        "start_state": jax.random.normal(ks[2], (args.batch, 4)) * 10,
    }
    dt = scan_step_time(trainer, state, batch, iters=args.iters,
                        repeats=args.repeats)
    rate = args.batch * args.particles * t / dt
    print(f"measurement={args.measurement} nf_dyn={args.nf_dyn} "
          f"nf_cond={args.nf_cond} resampler={args.resampler} "
          f"pallas={args.use_pallas} dtype={args.compute_dtype} "
          f"B={args.batch} N={args.particles} "
          f"T={t}: {dt*1e3:.1f} ms/step ({rate/1e6:.2f}M pt/s)")


if __name__ == "__main__":
    main()
