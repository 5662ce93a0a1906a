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


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Leading-dim batch sharding over the dp axis (or all dp_* axes of a
    hybrid DCNxICI mesh when `axis` is None and 'dp' is absent)."""
    if axis is None:
        names = dp_axis_names(mesh)
        axis = names[0] if len(names) == 1 else names
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis=None) -> Any:
    """Device-put every array leaf with its leading dim split over `axis`
    (default: the mesh's dp axes). Non-array leaves pass through untouched.
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


def dp_axis_names(mesh: Mesh):
    """Every mesh axis that carries data parallelism ('dp' and the hybrid
    'dp_dcn'/'dp_ici' pair); batches shard over all of them jointly."""
    names = tuple(n for n in mesh.axis_names if str(n).startswith("dp"))
    if not names:
        raise ValueError(f"mesh {mesh.axis_names} has no dp axis")
    return names


def tp_leaf_spec(x, mesh: Mesh, tp_axis: str = "tp", min_size: int = 256) -> P:
    """Tensor-parallel PartitionSpec for one parameter/optimizer leaf: wide
    trailing (output-channel) dims shard over `tp_axis`, everything else
    replicates. Applied uniformly to params AND optimizer moments (same
    shapes -> same specs), so AdamW math stays local to each shard."""
    if tp_axis not in mesh.axis_names:
        return P()
    tp = mesh.shape[tp_axis]
    if (
        getattr(x, "ndim", 0) >= 1
        and x.shape[-1] >= min_size
        and x.shape[-1] % tp == 0
    ):
        return P(*([None] * (x.ndim - 1) + [tp_axis]))
    return P()


def shard_train_state(state: Any, mesh: Mesh, tp_axis: str = "tp",
                      min_size: int = 256) -> Any:
    """device_put a TrainState pytree with TP shardings for wide leaves and
    replication for the rest. With no 'tp' axis this degenerates to full
    replication (pure DP)."""
    def put(x):
        if not hasattr(x, "shape"):
            return x
        spec = tp_leaf_spec(x, mesh, tp_axis, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, state)
