"""Worker for the 2-process sharded TRAIN-STEP test (VERDICT r4 #7).

Launched by `tests/test_distributed.py` as two separate processes, each with
4 virtual CPU devices (8 global).  Builds a ('data', 'particle') mesh whose
PARTICLE axis spans the two processes — the layout a real multi-host pod
would use for BASELINE config 5 — and runs one full
`Trainer.make_train_step` (filter forward + losses + backward + Adam) on
globally sharded inputs.  Every collective the filter needs (weight
normalisation psums, resampling all-gathers, loss reductions) therefore
crosses the process boundary.

    python tests/distributed_train_worker.py  (env vars set by the test)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from nfdpf_tpu.parallel import distributed

    distributed.initialize()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.parallel.mesh import DATA_AXIS, PARTICLE_AXIS
    from nfdpf_tpu.train import Trainer

    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == nproc * n_local

    # particle axis ACROSS processes: global devices [0..7] reshaped
    # (nproc, n_local) puts each row in one process; the transpose makes the
    # second mesh axis (particle) index processes — every particle-axis
    # collective crosses the process boundary.
    arr = np.array(sorted(jax.devices(), key=lambda d: d.id))
    mesh = Mesh(arr.reshape(nproc, n_local).T, (DATA_AXIS, PARTICLE_AXIS))
    assert mesh.shape == {DATA_AXIS: n_local, PARTICLE_AXIS: nproc}

    cfg = DPFConfig(
        num_particles=16, sequence_length=3, batch_size=4,
        resampler_type="soft", measurement="cos",
    )
    trainer = Trainer(cfg, mesh=mesh)

    # identical seeds on every process → identical host values; global
    # arrays are assembled from them via callbacks (device_put cannot build
    # process-spanning shardings from host arrays)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    t = cfg.sequence_length
    batch_host = {
        "image": jax.random.uniform(ks[0], (4, t, 128, 128, 3)),
        "state": jax.random.normal(ks[1], (4, t, 4)) * 10,
        "start_state": jax.random.normal(ks[2], (4, 4)) * 10,
    }

    def globalize(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
        )

    state = jax.tree_util.tree_map(lambda x: globalize(x, P()), state)
    batch = {k: globalize(v, P(DATA_AXIS)) for k, v in batch_host.items()}

    step = trainer.make_train_step()
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    loss1 = float(metrics["loss"].addressable_data(0))
    assert np.isfinite(loss1), f"non-finite loss {loss1}"

    # second step: reuses the compiled executable, chained state
    _, metrics2 = step(new_state, batch, jax.random.PRNGKey(3))
    loss2 = float(metrics2["loss"].addressable_data(0))
    assert np.isfinite(loss2), f"non-finite loss {loss2}"

    print(
        f"proc {jax.process_index()}/{nproc}: mesh "
        f"{dict(mesh.shape)} losses {loss1:.4f}/{loss2:.4f} OK",
        flush=True,
    )


if __name__ == "__main__":
    main()
