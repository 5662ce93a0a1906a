"""Pure diffusion math: schedules, the two scheduler families, and Pallas
TPU kernels for the hot ops."""

from v2a_tpu.ops.schedules import (
    linear_beta_schedule,
    cosine_beta_schedule,
    sigmoid_beta_schedule,
    squaredcos_cap_v2_beta_schedule,
    DiffusionSchedule,
)
from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
from v2a_tpu.ops.action_scheduler import DDPMScheduler, DDIMScheduler

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "sigmoid_beta_schedule",
    "squaredcos_cap_v2_beta_schedule",
    "DiffusionSchedule",
    "GaussianDiffusion",
    "DDPMScheduler",
    "DDIMScheduler",
]
