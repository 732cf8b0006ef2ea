"""Test configuration: force an 8-device virtual CPU mesh.

A pytest plugin imports jax before this conftest runs, so the JAX_PLATFORMS
env var is already snapshotted as the config default.  Backends initialise
lazily, so overriding via ``jax.config.update`` here (before any test touches
a device) still takes effect.  XLA_FLAGS is read at backend-init time, so the
env assignment below is also still early enough.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert not jax._src.xla_bridge._backends, (
    "JAX backends initialised before conftest could force CPU; "
    "tests would run on the wrong platform."
)
