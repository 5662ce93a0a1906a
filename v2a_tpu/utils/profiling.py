"""Tracing / profiling / reporting utilities.

The reference's observability is a wall-clock `Timer`
(`diffuser/utils/luo_utils.py:37-46`), pynvml GPU-memory polling
(`flowdiffusion/flowdiffusion/goal_diffusion.py:41-47`), a parameter-count
report (`diffuser/utils/arrays.py:95-112`), and colored stdout
(`diffuser/utils/eval_utils.py:201-217`). TPU-native upgrades here:

- `trace(...)`: context manager around `jax.profiler` emitting xplane
  traces viewable in TensorBoard/XProf — strictly more than the reference's
  prints (SURVEY §5),
- `device_memory_stats()`: per-device HBM stats from the JAX runtime
  (replacing pynvml),
- `Timer`, `param_count`/`report_parameters`, `print_color` with the same
  call shapes as the originals.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import numpy as np


class Timer:
    """Interval timer: calling it returns seconds since the last call
    (`luo_utils.py:37-46`)."""

    def __init__(self):
        self._start = time.time()

    def __call__(self, reset: bool = True) -> float:
        now = time.time()
        diff = now - self._start
        if reset:
            self._start = now
        return diff


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Capture a JAX profiler trace (xplane) under `logdir`."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out: Dict[str, Dict[str, int]] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                k: int(v)
                for k, v in stats.items()
                if isinstance(v, (int, np.integer))
            }
    return out


def param_count(tree: Any) -> int:
    import jax

    return sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree)
    )


def report_parameters(tree: Any, topk: int = 10, name: str = "model") -> int:
    """Total + largest-leaf report (`diffuser/utils/arrays.py:95-112`)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    total = sum(int(np.prod(p.shape)) for _, p in flat)
    print_color(f"[ utils ] {name}: {total:,} parameters", c="g")
    sized = sorted(
        ((jax.tree_util.keystr(k), int(np.prod(p.shape)), tuple(p.shape))
         for k, p in flat),
        key=lambda kv: -kv[1],
    )
    for key, n, shape in sized[:topk]:
        print(f"  {n:>12,}  {shape}  {key}")
    return total


_COLORS = {"r": 31, "g": 32, "y": 33, "b": 34, "m": 35, "c": 36}


def print_color(s: str, c: str = "y", **kwargs):
    """Colored stdout (`eval_utils.py:201-217`)."""
    code = _COLORS.get(c, 33)
    print(f"\033[{code}m{s}\033[0m", **kwargs)
