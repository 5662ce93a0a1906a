"""Device-mesh construction, sharding helpers, and host->device prefetch."""

from v2a_tpu.parallel.mesh import make_mesh
from v2a_tpu.parallel.sharding import (
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from v2a_tpu.parallel.prefetch import PrefetchIterator

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "PrefetchIterator",
]
