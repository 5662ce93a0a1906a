"""Action-policy diffusion schedulers (the HF-diffusers family).

The reference policy uses `diffusers.DDPMScheduler` for training/full
sampling and `diffusers.DDIMScheduler` (8 steps) at rollout
(`diffuser/diffusion_policy/diffusion_unet_image_policy.py:6-7,100-131`;
configured at `config/diff_policy/lb_train_diffusion_unet_image_orn10.yaml:
43-52,105-113`). This module re-implements that exact step math as pure JAX
functions so the whole denoising loop can live inside one jitted
`lax.scan`. The two scheduler families in this codebase intentionally stay
separate — the video model's sampler (`ops/gaussian_diffusion.py`) uses the
lucidrains timestep-pairing convention, which differs subtly from the
diffusers "leading" spacing reproduced here.

Semantics replicated (and covered by golden tests):
- `squaredcos_cap_v2` betas,
- DDPM: `variance_type='fixed_small'`, `clip_sample=True`,
  `prediction_type='epsilon'`,
- DDIM: `set_alpha_to_one=True`, `steps_offset=0`, eta=0 (deterministic),
  clipped x0 with *unclipped* epsilon for the direction term
  (diffusers' `use_clipped_model_output=False` default),
- "leading" timestep spacing: `(arange(n) * (T // n))[::-1]`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.ops.schedules import _BETA_SCHEDULES, extract


def _make_tables(
    num_train_timesteps: int,
    beta_schedule: str,
    beta_start: float,
    beta_end: float,
) -> Tuple[np.ndarray, np.ndarray]:
    if beta_schedule == "linear":
        # diffusers 'linear' (unscaled endpoints), unlike the video family's
        # 1000/T-rescaled linear schedule.
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        betas = _BETA_SCHEDULES["squaredcos_cap_v2"](num_train_timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return betas, alphas_cumprod


def _gather_or_final(table, idx, final_value, nd):
    """table[idx] where idx >= 0 else `final_value`, reshaped to broadcast
    against an nd-dimensional sample. Supports scalar or (B,) idx."""
    idx = jnp.asarray(idx)
    val = jnp.where(idx >= 0, table[jnp.maximum(idx, 0)], final_value)
    return val.reshape(val.shape + (1,) * (nd - val.ndim))


def leading_timesteps(num_train_timesteps: int, num_inference_steps: int,
                      steps_offset: int = 0) -> np.ndarray:
    """Diffusers' default "leading" spacing: for T=100, n=8 this yields
    [84, 72, 60, 48, 36, 24, 12, 0]."""
    if num_inference_steps > num_train_timesteps:
        raise ValueError("num_inference_steps must be <= num_train_timesteps")
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
    return ts.astype(np.int32) + steps_offset


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    """Pure-function DDPM scheduler (ancestral sampling + q forward)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(default=True, metadata=dict(static=True))
    clip_sample_range: float = dataclasses.field(
        default=1.0, metadata=dict(static=True)
    )
    variance_type: str = dataclasses.field(
        default="fixed_small", metadata=dict(static=True)
    )
    prediction_type: str = dataclasses.field(
        default="epsilon", metadata=dict(static=True)
    )

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 100,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "squaredcos_cap_v2",
        clip_sample: bool = True,
        variance_type: str = "fixed_small",
        prediction_type: str = "epsilon",
    ) -> "DDPMScheduler":
        betas, acp = _make_tables(
            num_train_timesteps, beta_schedule, beta_start, beta_end
        )
        return cls(
            betas=jnp.asarray(betas, jnp.float32),
            alphas_cumprod=jnp.asarray(acp, jnp.float32),
            num_train_timesteps=num_train_timesteps,
            clip_sample=clip_sample,
            variance_type=variance_type,
            prediction_type=prediction_type,
        )

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return leading_timesteps(self.num_train_timesteps, num_inference_steps)

    def add_noise(self, x_start, noise, t):
        nd = x_start.ndim
        sqrt_acp = extract(jnp.sqrt(self.alphas_cumprod), t, nd)
        sqrt_1m = extract(jnp.sqrt(1.0 - self.alphas_cumprod), t, nd)
        return sqrt_acp * x_start + sqrt_1m * noise

    def _pred_x0(self, model_output, t, sample):
        nd = sample.ndim
        alpha_prod_t = extract(self.alphas_cumprod, t, nd)
        beta_prod_t = 1.0 - alpha_prod_t
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(
                alpha_prod_t
            )
        elif self.prediction_type == "sample":
            x0 = model_output
        else:
            raise ValueError(f"unsupported prediction type {self.prediction_type!r}")
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0

    def step(
        self,
        model_output: jax.Array,
        t: jax.Array,
        prev_t: jax.Array,
        sample: jax.Array,
        noise: jax.Array,
        var_temp: float = 1.0,
    ) -> jax.Array:
        """One ancestral denoising step x_t -> x_{t-1}.

        `t`/`prev_t` are scalar int32 tracers (prev_t = t - T//n, may be
        negative — then alpha_bar_prev := 1). `noise` must be pre-sampled
        standard normal of `sample`'s shape; it is zeroed when t == 0.
        `var_temp` scales the injected noise, the hook the reference keeps on
        the policy as `ddpm_var_temp` (`diffusion_unet_image_policy.py:70`).
        """
        nd = sample.ndim
        alpha_prod_t = extract(self.alphas_cumprod, t, nd)
        alpha_prod_t_prev = _gather_or_final(self.alphas_cumprod, prev_t, 1.0, nd)
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1.0 - current_alpha_t

        x0 = self._pred_x0(model_output, t, sample)

        pred_original_coeff = (
            jnp.sqrt(alpha_prod_t_prev) * current_beta_t / beta_prod_t
        )
        current_sample_coeff = (
            jnp.sqrt(current_alpha_t) * beta_prod_t_prev / beta_prod_t
        )
        pred_prev = pred_original_coeff * x0 + current_sample_coeff * sample

        if self.variance_type != "fixed_small":
            raise NotImplementedError(self.variance_type)
        variance = jnp.clip(
            beta_prod_t_prev / beta_prod_t * current_beta_t, 1e-20, None
        )
        noise_mask = jnp.where(jnp.asarray(t) > 0, 1.0, 0.0)
        noise_mask = noise_mask.reshape(noise_mask.shape + (1,) * (nd - noise_mask.ndim))
        return pred_prev + noise_mask * jnp.sqrt(variance) * noise * var_temp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """Pure-function DDIM scheduler (deterministic at eta=0)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(default=True, metadata=dict(static=True))
    clip_sample_range: float = dataclasses.field(
        default=1.0, metadata=dict(static=True)
    )
    set_alpha_to_one: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )
    steps_offset: int = dataclasses.field(default=0, metadata=dict(static=True))
    prediction_type: str = dataclasses.field(
        default="epsilon", metadata=dict(static=True)
    )

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 100,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "squaredcos_cap_v2",
        clip_sample: bool = True,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
    ) -> "DDIMScheduler":
        betas, acp = _make_tables(
            num_train_timesteps, beta_schedule, beta_start, beta_end
        )
        return cls(
            betas=jnp.asarray(betas, jnp.float32),
            alphas_cumprod=jnp.asarray(acp, jnp.float32),
            num_train_timesteps=num_train_timesteps,
            clip_sample=clip_sample,
            set_alpha_to_one=set_alpha_to_one,
            steps_offset=steps_offset,
            prediction_type=prediction_type,
        )

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return leading_timesteps(
            self.num_train_timesteps, num_inference_steps, self.steps_offset
        )

    def step(
        self,
        model_output: jax.Array,
        t: jax.Array,
        prev_t: jax.Array,
        sample: jax.Array,
        eta: float = 0.0,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """One DDIM step. With `clip_sample` the clipped x0 is used for the
        mean but epsilon is NOT re-derived (diffusers'
        `use_clipped_model_output=False` default)."""
        nd = sample.ndim
        alpha_prod_t = extract(self.alphas_cumprod, t, nd)
        final_alpha = 1.0 if self.set_alpha_to_one else self.alphas_cumprod[0]
        alpha_prod_t_prev = _gather_or_final(
            self.alphas_cumprod, prev_t, final_alpha, nd
        )
        beta_prod_t = 1.0 - alpha_prod_t

        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(
                alpha_prod_t
            )
            pred_epsilon = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            pred_epsilon = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(
                beta_prod_t
            )
        else:
            raise ValueError(f"unsupported prediction type {self.prediction_type!r}")

        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)

        if eta > 0.0:
            variance = (1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t) * (
                1.0 - alpha_prod_t / alpha_prod_t_prev
            )
            std_dev_t = eta * jnp.sqrt(variance)
        else:
            std_dev_t = 0.0

        pred_dir = jnp.sqrt(1.0 - alpha_prod_t_prev - std_dev_t**2) * pred_epsilon
        prev_sample = jnp.sqrt(alpha_prod_t_prev) * x0 + pred_dir
        if eta > 0.0:
            if noise is None:
                raise ValueError("noise required when eta > 0")
            prev_sample = prev_sample + std_dev_t * noise
        return prev_sample
