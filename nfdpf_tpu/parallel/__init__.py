"""Device-mesh / sharding layer: batch ('data') × particle axes over ICI."""

from nfdpf_tpu.parallel.mesh import (
    constrain,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "constrain"]
