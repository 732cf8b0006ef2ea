"""Worker for the 2-process `jax.distributed` bring-up test.

Launched by `tests/test_distributed.py` as two separate processes, each with
2 virtual CPU devices.  Exercises the exact glue a real multi-host TPU pod
run uses (`nfdpf_tpu/parallel/distributed.py` reading the
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars),
builds the global ('data','particle') mesh spanning BOTH processes, and runs
a cross-process collective whose result every process can verify.

    python tests/distributed_worker.py  (env vars set by the test)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    # Force the CPU platform through the config too: a PJRT plugin (e.g. the
    # TPU tunnel) can win default-backend selection over the env var, and
    # then process_count() reports that backend's single process.
    jax.config.update("jax_platforms", "cpu")
    # multi-process CPU backends need a cross-process collectives impl —
    # single-process CPU (the default) reports process_count()==1 even after
    # a successful coordination-service rendezvous
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from nfdpf_tpu.parallel import distributed

    distributed.initialize()  # env-var path (parallel/distributed.py:36-45)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nfdpf_tpu.parallel.mesh import make_mesh

    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc, (
        f"process_count {jax.process_count()} != {nproc}"
    )
    assert jax.local_device_count() == 2
    n_global = jax.device_count()
    assert n_global == 2 * nproc

    # global mesh spanning both processes
    mesh = make_mesh(data=n_global, particle=1)
    sharding = NamedSharding(mesh, P("data"))

    # Build a global array from process-local shards: process p holds values
    # [2p, 2p+1]; the jitted global sum crosses the process boundary.
    local = np.arange(2, dtype=np.float32) + 2 * jax.process_index()
    garr = jax.make_array_from_process_local_data(
        sharding, local, global_shape=(n_global,)
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    expect = float(sum(range(n_global)))
    got = float(total.addressable_data(0))
    assert got == expect, f"cross-process psum: got {got}, want {expect}"

    assert distributed.is_primary() == (jax.process_index() == 0)
    print(f"proc {jax.process_index()}/{nproc}: global sum {got} OK",
          flush=True)


if __name__ == "__main__":
    main()
