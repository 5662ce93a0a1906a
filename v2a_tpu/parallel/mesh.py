"""Device mesh construction.

The reference's "distributed" layer is HF Accelerate configured but
degenerate (single process; SURVEY §2.11). Here scale-out is native: a
`jax.sharding.Mesh` over all available devices with a data-parallel axis,
ready to be extended with model axes. Training batches are sharded over
'dp'; parameters are replicated; XLA inserts the grad all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Tuple[str, ...] = ("dp",),
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over `devices` (default: all).

    With the default single 'dp' axis the mesh is 1-D over every device.
    `shape` reshapes the device array for multi-axis layouts, e.g.
    ``make_mesh(("dp", "mp"), (4, 2))`` on 8 chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != #devices {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def local_batch_multiple(mesh: Mesh, axis: str = "dp") -> int:
    """Global batch sizes must be divisible by this."""
    return mesh.shape[axis]
