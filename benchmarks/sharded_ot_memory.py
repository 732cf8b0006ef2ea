"""Memory proof for particle-sharded streaming OT at N=8192 (VERDICT r2 #4).

On an 8-device virtual CPU mesh with the particle axis sharded 8-way, the
streaming Sinkhorn path must (a) execute, and (b) never materialise an
O(N²) transport/cost tensor — each shard holds O(N·d/shards) and merges via
collectives.  Proof is structural: the compiled HLO of the streaming program
contains no N×N buffer, while the dense reference formulation
(`/root/reference/resamplers/resamplers.py:94-210` semantics, ops/sinkhorn)
necessarily allocates f32[B,N,N].  Where the backend exposes
``memory_analysis`` the temp-buffer totals are reported too.

    python benchmarks/sharded_ot_memory.py --particles 8192
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=8192)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--max-iter", type=int, default=8)
    p.add_argument("--out", default="experiments/sharded_ot_n8192.json")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp

    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.models.dpf import DPF
    from nfdpf_tpu.parallel.mesh import make_mesh

    n, b = args.particles, args.batch
    mesh = make_mesh(data=1, particle=args.devices)
    cfg = DPFConfig(num_particles=n, batch_size=b, resampler_type="ot",
                    use_pallas=True, max_iter=args.max_iter)
    engine = DPF(cfg, mesh=mesh)

    key = jax.random.PRNGKey(0)
    kp, kw, kr = jax.random.split(key, 3)
    from jax.sharding import NamedSharding, PartitionSpec as P

    particles = jax.device_put(
        jax.random.normal(kp, (b, n, 2)) * 10,
        NamedSharding(mesh, P("data", "particle")))
    logits = jax.random.normal(kw, (b, n))
    probs = jax.device_put(
        jax.nn.softmax(logits),
        NamedSharding(mesh, P("data", "particle")))

    fn = jax.jit(lambda k, pt, pr: engine._resample(k, pt, pr))
    lowered = fn.lower(kr, particles, probs)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # any buffer with two particle-sized trailing dims = dense N² tensor
    nxn = re.findall(rf"f32\[(?:\d+,)*{n},{n}\]", hlo)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            mem = {
                "temp_bytes": int(getattr(ma, "temp_size_in_bytes", 0)),
                "argument_bytes": int(getattr(ma, "argument_size_in_bytes", 0)),
                "output_bytes": int(getattr(ma, "output_size_in_bytes", 0)),
            }
    except Exception as e:  # noqa: BLE001
        mem = {"memory_analysis": f"unavailable: {e}"}

    t0 = time.time()
    out_p, out_w, out_i = fn(kr, particles, probs)
    out_p.block_until_ready()
    dt = time.time() - t0

    ok = bool(jnp.all(jnp.isfinite(out_p)) and jnp.all(jnp.isfinite(out_w)))
    mean_drift = float(jnp.max(jnp.abs(
        jnp.sum(probs[..., None] * particles, axis=1)
        - jnp.mean(out_p, axis=1))))

    # dense-path comparison: LOWER only (running would allocate B·N² f32)
    cfg_dense = cfg.replace(use_pallas=False)
    engine_dense = DPF(cfg_dense, mesh=None)
    dense_hlo = jax.jit(
        lambda k, pt, pr: engine_dense._resample(k, pt, pr)
    ).lower(kr, jax.device_get(particles), jax.device_get(probs)) \
     .compile().as_text()
    dense_nxn = re.findall(rf"f32\[(?:\d+,)*{n},{n}\]", dense_hlo)

    result = {
        "particles": n, "batch": b, "devices": args.devices,
        "mesh": {"data": 1, "particle": args.devices},
        "streaming_nxn_buffers": len(nxn),
        "dense_nxn_buffers": len(dense_nxn),
        "dense_nxn_bytes_each": 4 * n * n,
        "finite_outputs": ok,
        "weighted_mean_drift": mean_drift,
        "first_call_seconds": dt,
        **mem,
    }
    print(json.dumps(result, indent=2))
    assert ok, "non-finite streaming OT outputs"
    assert len(nxn) == 0, f"streaming HLO materialises N×N: {nxn[:3]}"
    assert len(dense_nxn) > 0, "dense control failed to show N×N (bad regex?)"
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
