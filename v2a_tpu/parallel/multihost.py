"""Multi-host / multi-slice mesh construction.

The reference's distributed stack is NCCL/MPI plumbing that is never
exercised (SURVEY §2.11); the TPU-native story is `jax.distributed` + a
mesh whose inner axis maps onto ICI (fast, within a slice) and whose outer
axis maps onto DCN (slower, across slices). Gradients all-reduce over 'dp'
(hierarchically: ICI first, DCN once per slice) with zero user-level
communication code — XLA inserts the collectives from the shardings.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """`jax.distributed.initialize` wrapper; a no-op in single-process runs
    (all args None and no cluster env detected)."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            # auto-detection found no cluster environment — the expected
            # single-process case. Anything else (real cluster misconfig)
            # propagates instead of being silently swallowed.
            import logging

            logging.getLogger(__name__).info(
                "jax.distributed not initialized (single process): %s", e
            )
            return False
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(
    ici_axis: str = "dp_ici",
    dcn_axis: str = "dp_dcn",
    devices=None,
) -> Mesh:
    """2-D (DCN x ICI) mesh: devices grouped by process/slice on the outer
    axis. Shard batches over BOTH axes for pure data parallelism; keep
    model axes on ICI only."""
    devices = list(devices if devices is not None else jax.devices())
    n_slices = max(
        len({d.process_index for d in devices}), 1
    )
    per_slice = len(devices) // n_slices
    dev = np.empty((n_slices, per_slice), dtype=object)
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    for i, (proc, ds) in enumerate(sorted(by_proc.items())):
        dev[i, :] = ds
    return Mesh(dev, (dcn_axis, ici_axis))
