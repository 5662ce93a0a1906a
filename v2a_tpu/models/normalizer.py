"""Constant-limits normalization to [-1, 1].

Pure-function counterpart of the reference's `LimitsConstNormalizer` /
`ConstNormalizerGroup` (`diffuser/diffusion_policy/normalizer.py:6-162`):
fixed per-dimension [min, max] constants (images [0,1], Libero actions ±1 —
`diffuser/datasets/__init__.py:20-45`), mapped linearly to [-1, 1]. Folded
into the jitted policy functions rather than being a stateful module; the
clamp-on-unnormalize behavior (`normalizer.py:150-157`) is preserved.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Libero action bounds (`diffuser/datasets/__init__.py:20-26`)
LB_ACTION_MIN = np.full((7,), -1.0, dtype=np.float32)
LB_ACTION_MAX = np.full((7,), 1.0, dtype=np.float32)
# orn-limited variant (`diffuser/datasets/__init__.py:32-35`)
LB_ACTION_MIN_ORN01 = np.asarray([-1.0] * 3 + [-0.1] * 3 + [-1.0], dtype=np.float32)
LB_ACTION_MAX_ORN01 = np.asarray([1.0] * 3 + [0.1] * 3 + [1.0], dtype=np.float32)
# MetaWorld Sawyer bounds (`diffuser/datasets/__init__.py:4-6`)
MW_SAWYER_ACTION_MIN = np.full((4,), -1.0, dtype=np.float32)
MW_SAWYER_ACTION_MAX = np.full((4,), 1.0, dtype=np.float32)
# iThor discrete 4-dim bounds (`diffuser/datasets/__init__.py:50-58`)
THOR_ACTION_MIN_DIM4 = np.full((4,), -1.0, dtype=np.float32)
THOR_ACTION_MAX_DIM4 = np.full((4,), 1.0, dtype=np.float32)
# Calvin relative + absolute bounds (`diffuser/datasets/__init__.py:62-80`)
CAL_ACTION_MIN = np.full((7,), -1.0, dtype=np.float32)
CAL_ACTION_MAX = np.full((7,), 1.0, dtype=np.float32)
CAL_ABS_ACTION_MIN = (
    np.asarray([-0.20, -0.50, 0.3, -3.15, -0.50, -3.15, -1.0], np.float32)
    - 0.01
)
CAL_ABS_ACTION_MAX = (
    np.asarray([0.36, 0.12, 0.70, 3.15, 0.30, 3.15, 1.0], np.float32) + 0.01
)
# CLIP task-embedding placeholder bounds (`diffuser/datasets/__init__.py:42-45`)
TASK_EMBED_MIN = np.zeros((512,), dtype=np.float32)
TASK_EMBED_MAX = np.ones((512,), dtype=np.float32)
IMAGE_MIN = np.zeros((3,), dtype=np.float32)
IMAGE_MAX = np.ones((3,), dtype=np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LimitsNormalizer:
    """Maps [mins, maxs] -> [-1, 1] elementwise over the trailing axis."""

    mins: jax.Array
    maxs: jax.Array

    @classmethod
    def create(cls, mins, maxs) -> "LimitsNormalizer":
        mins = jnp.asarray(mins, jnp.float32)
        maxs = jnp.asarray(maxs, jnp.float32)
        return cls(mins=mins, maxs=maxs)

    def normalize(self, x: jax.Array) -> jax.Array:
        x = (x - self.mins) / (self.maxs - self.mins)
        return 2.0 * x - 1.0

    def unnormalize(self, x: jax.Array) -> jax.Array:
        # `normalizer.py:148-161`: clamp out-of-limit samples first
        x = jnp.clip(x, -1.0, 1.0)
        x = (x + 1.0) * 0.5
        return x * (self.maxs - self.mins) + self.mins


def image_normalizer() -> LimitsNormalizer:
    return LimitsNormalizer.create(IMAGE_MIN, IMAGE_MAX)


def lb_action_normalizer(orn01: bool = False) -> LimitsNormalizer:
    if orn01:
        return LimitsNormalizer.create(LB_ACTION_MIN_ORN01, LB_ACTION_MAX_ORN01)
    return LimitsNormalizer.create(LB_ACTION_MIN, LB_ACTION_MAX)
