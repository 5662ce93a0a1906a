"""NamedSharding helpers for data-parallel training.

Replaces the reference's synchronous `.to(device)` host->GPU copies
(`diffuser/libero/lb_online_trainer_v7.py:586`) with explicit
`jax.device_put` onto NamedShardings: batches split along 'dp', parameters
replicated. XLA then compiles the gradient all-reduce onto ICI.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Device-put every array leaf with its leading dim split over `axis`.

    Non-array leaves (strings etc.) pass through untouched.
    """
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, tree
    )
