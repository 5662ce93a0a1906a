"""Diffusion noise schedules and derived coefficient tables.

All schedules are computed on the host in float64 (numpy) and stored as
float32 device arrays, matching the numerics of the reference implementation
(`flowdiffusion/flowdiffusion/goal_diffusion.py:307-342` computes betas in
torch.float64 and registers buffers as float32).

The tables live in a single frozen pytree (`DiffusionSchedule`) so that jitted
samplers can close over them or take them as arguments; indexing a table with
a per-example timestep vector replaces the reference's `extract()` gather
(`goal_diffusion.py:302-306`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear schedule from the original DDPM paper, rescaled so that the
    total noise injected is independent of `timesteps`.

    Mirrors `goal_diffusion.py:308-315`.
    """
    scale = 1000.0 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal). Mirrors `goal_diffusion.py:317-327`."""
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int,
    start: float = -3,
    end: float = 3,
    tau: float = 1,
) -> np.ndarray:
    """Sigmoid schedule (arXiv 2212.11972 Fig. 8). Mirrors
    `goal_diffusion.py:329-342`."""

    def _sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    alphas_cumprod = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def squaredcos_cap_v2_beta_schedule(
    timesteps: int,
    max_beta: float = 0.999,
) -> np.ndarray:
    """The `squaredcos_cap_v2` schedule of the HF-diffusers scheduler family
    used by the action-diffusion policy
    (`config/diff_policy/lb_train_diffusion_unet_image_orn10.yaml:47,106`).

    Identical math to `cosine_beta_schedule` expressed per-step; kept as a
    separate entry point so configs can name either family's spelling.
    """

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = np.empty(timesteps, dtype=np.float64)
    for i in range(timesteps):
        t1 = i / timesteps
        t2 = (i + 1) / timesteps
        betas[i] = min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta)
    return betas


_BETA_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
    "squaredcos_cap_v2": squaredcos_cap_v2_beta_schedule,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed coefficient tables for a discrete-time diffusion.

    Array fields are all shape (T,) float32 and form the pytree leaves;
    `num_timesteps` is static metadata. Matches the buffer set registered by
    the reference at `goal_diffusion.py:405-462` plus the min-SNR loss
    weights.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    snr: jax.Array
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        timesteps: int,
        beta_schedule: str = "cosine",
        schedule_kwargs: Optional[dict] = None,
    ) -> "DiffusionSchedule":
        if beta_schedule not in _BETA_SCHEDULES:
            raise ValueError(f"unknown beta schedule {beta_schedule!r}")
        betas = _BETA_SCHEDULES[beta_schedule](timesteps, **(schedule_kwargs or {}))

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(
                np.log(np.clip(posterior_variance, 1e-20, None))
            ),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev)
                * np.sqrt(alphas)
                / (1.0 - alphas_cumprod)
            ),
            snr=f32(alphas_cumprod / (1.0 - alphas_cumprod)),
            num_timesteps=int(timesteps),
        )

    def loss_weight(
        self,
        objective: str,
        min_snr_loss_weight: bool = False,
        min_snr_gamma: float = 5.0,
    ) -> jax.Array:
        """Per-timestep loss weights (min-SNR, arXiv 2303.09556). Mirrors
        `goal_diffusion.py:445-456`."""
        snr = self.snr
        clipped = jnp.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr
        if objective == "pred_noise":
            return clipped / snr
        if objective == "pred_x0":
            return clipped
        if objective == "pred_v":
            return clipped / (snr + 1.0)
        raise ValueError(f"unknown objective {objective!r}")


def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-example coefficients and reshape for broadcasting against an
    `ndim`-dimensional batch tensor. Replaces `goal_diffusion.py:302-306`."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))
