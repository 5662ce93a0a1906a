"""Video-family Gaussian diffusion: training losses, ancestral (DDPM) and
DDIM samplers, with classifier-free guidance and low-temperature noise.

This is the TPU-native counterpart of the reference's `GoalGaussianDiffusion`
(`flowdiffusion/flowdiffusion/goal_diffusion.py:346-733`), re-designed as a
set of pure functions over a `DiffusionSchedule` coefficient pytree:

- the Python `for t in reversed(range(T))` device loop of the reference
  (`goal_diffusion.py:583-599`) becomes a single traced `lax.scan` over the
  timestep table, so the 100-step sampler compiles to one XLA program with
  one U-Net body;
- randomness is explicit `jax.random` key plumbing instead of global torch
  RNG;
- all loop-level math is float32 regardless of the model's internal compute
  dtype (the reference keeps its schedule buffers fp32 under fp16 autocast).

The model callable has signature `model_fn(x, t, task_embed) -> out` where
`x` already includes the conditioning frame; this module appends the
conditioning exactly as the reference does by channel-concatenation
(`goal_diffusion.py:506,518`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.ops.schedules import DiffusionSchedule, extract

ModelFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def _concat_cond(x: jax.Array, x_cond: jax.Array) -> jax.Array:
    """Append the conditioning frame on the trailing channel axis.

    The reference stacks along torch's channel dim 1 (`goal_diffusion.py:506`);
    here tensors are channels-last and `x_cond` may carry broadcast dims
    (e.g. (B, 1, H, W, 3) against a (B, F, H, W, C) video) which are tiled.
    """
    target = x.shape[:-1] + (x_cond.shape[-1],)
    x_cond = jnp.broadcast_to(x_cond, target)
    return jnp.concatenate([x, x_cond.astype(x.dtype)], axis=-1)


class ModelPrediction(NamedTuple):
    pred_noise: jax.Array
    pred_x_start: jax.Array


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Static sampler configuration bound to a schedule.

    Mirrors the constructor knobs of `goal_diffusion.py:346-464` that the
    Libero pipeline exercises (objective, schedule, sampling steps, CFG
    weight, sampling temperature, min-SNR weighting).
    """

    schedule: DiffusionSchedule
    objective: str = "pred_v"
    sampling_timesteps: Optional[int] = None
    ddim_sampling_eta: float = 0.0
    guidance_weight: float = 0.0
    var_temp: float = 1.0
    # scan unroll factor for the denoise loops: >1 amortizes the per-step
    # control-table DMA latency the xplane trace exposed (PERF.md) at the
    # cost of a bigger compiled body
    scan_unroll: int = 1
    loss_type: str = "l2"
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    auto_normalize: bool = True

    def __post_init__(self):
        if self.objective not in ("pred_noise", "pred_x0", "pred_v"):
            raise ValueError(f"unknown objective {self.objective!r}")
        s = self.sampling_timesteps
        if s is not None and s > self.schedule.num_timesteps:
            raise ValueError("sampling_timesteps must be <= num_timesteps")

    # -- properties -------------------------------------------------------

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    @property
    def effective_sampling_timesteps(self) -> int:
        return self.sampling_timesteps or self.num_timesteps

    @property
    def is_ddim_sampling(self) -> bool:
        # `goal_diffusion.py:419`: DDIM only when strictly fewer sampling steps.
        return self.effective_sampling_timesteps < self.num_timesteps

    # -- parameterization conversions (goal_diffusion.py:466-489) ---------

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
        ) / extract(s.sqrt_recipm1_alphas_cumprod, t, nd)

    def predict_v(self, x_start, t, noise):
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * noise
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        nd = x_t.ndim
        mean = (
            extract(s.posterior_mean_coef1, t, nd) * x_start
            + extract(s.posterior_mean_coef2, t, nd) * x_t
        )
        log_var = extract(s.posterior_log_variance_clipped, t, nd)
        return mean, log_var

    def q_sample(self, x_start, t, noise):
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # -- model wrapping ---------------------------------------------------

    def model_predictions(
        self,
        model_fn: ModelFn,
        x: jax.Array,
        t: jax.Array,
        x_cond: jax.Array,
        task_embed: jax.Array,
        clip_x_start: bool = False,
        rederive_pred_noise: bool = False,
    ) -> ModelPrediction:
        """Run the denoiser and convert its output to (eps, x0).

        Classifier-free guidance follows `goal_diffusion.py:499-558`: the
        batch is doubled, the second half gets a zeroed task embedding, and
        for `pred_v` the guidance is applied in epsilon space after
        converting both halves.
        """
        gw = self.guidance_weight
        use_cfg = gw > 0.0
        x_in = _concat_cond(x, x_cond)

        maybe_clip = (
            (lambda z: jnp.clip(z, -1.0, 1.0)) if clip_x_start else (lambda z: z)
        )

        if not use_cfg:
            model_output = model_fn(x_in, t, task_embed)
            if self.objective == "pred_noise":
                pred_noise = model_output
                x_start = maybe_clip(self.predict_start_from_noise(x, t, pred_noise))
                if clip_x_start and rederive_pred_noise:
                    pred_noise = self.predict_noise_from_start(x, t, x_start)
            elif self.objective == "pred_x0":
                x_start = maybe_clip(model_output)
                pred_noise = self.predict_noise_from_start(x, t, x_start)
            else:  # pred_v
                x_start = maybe_clip(self.predict_start_from_v(x, t, model_output))
                pred_noise = self.predict_noise_from_start(x, t, x_start)
            return ModelPrediction(pred_noise, x_start)

        # classifier-free guidance: batch-doubled single forward
        x2 = jnp.concatenate([x_in, x_in], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        te2 = jnp.concatenate([task_embed, jnp.zeros_like(task_embed)], axis=0)
        out2 = model_fn(x2, t2, te2)
        b = x.shape[0]
        out_cond, out_uncond = out2[:b], out2[b:]

        if self.objective == "pred_noise":
            pred_noise = (1 + gw) * out_cond - gw * out_uncond
            x_start = maybe_clip(self.predict_start_from_noise(x, t, pred_noise))
            if clip_x_start and rederive_pred_noise:
                pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_x0":
            x_start = maybe_clip((1 + gw) * out_cond - gw * out_uncond)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v with CFG in epsilon space (goal_diffusion.py:536-548)
            cond_x0 = maybe_clip(self.predict_start_from_v(x, t, out_cond))
            uncond_x0 = self.predict_start_from_v(x, t, out_uncond)
            cond_noise = self.predict_noise_from_start(x, t, cond_x0)
            uncond_noise = self.predict_noise_from_start(x, t, uncond_x0)
            pred_noise = (1 + gw) * cond_noise - gw * uncond_noise
            x_start = self.predict_start_from_noise(x, t, pred_noise)
        return ModelPrediction(pred_noise, x_start)

    # -- ancestral sampling (goal_diffusion.py:560-599) -------------------

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: Tuple[int, ...],
        x_cond: jax.Array,
        task_embed: jax.Array,
        init_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Full-chain ancestral sampler as one `lax.scan` over t = T-1..0.

        Uses clipped x0 (`clip_denoised=True` as at `goal_diffusion.py:575`)
        and low-temperature noise `var_temp` (`goal_diffusion.py:577-580`).
        Returns samples mapped back to [0, 1]. `init_noise` overrides x_T
        (reproducible sampling / golden tests).
        """
        rng, init_rng = jax.random.split(rng)
        img = (
            init_noise if init_noise is not None
            else jax.random.normal(init_rng, shape, dtype=jnp.float32)
        )
        timesteps = jnp.arange(self.num_timesteps - 1, -1, -1)
        step_rngs = jax.random.split(rng, self.num_timesteps)
        img, _ = jax.lax.scan(
            self._p_step_fn(model_fn, x_cond, task_embed),
            img, (timesteps, step_rngs), unroll=self.scan_unroll,
        )
        return self._unnormalize(img)

    def _p_step_fn(self, model_fn, x_cond, task_embed):
        """One ancestral denoise step as a scan body — shared by the
        one-scan sampler above and the chunked dispatch path
        (`sample_scan_chunk`), so both compute the identical sequence."""

        def step(img, inputs):
            t_scalar, step_rng = inputs
            t = jnp.full((img.shape[0],), t_scalar, dtype=jnp.int32)
            preds = self.model_predictions(model_fn, img, t, x_cond, task_embed)
            x_start = jnp.clip(preds.pred_x_start, -1.0, 1.0)
            mean, log_var = self.q_posterior(x_start, img, t)
            noise = jax.random.normal(step_rng, img.shape, dtype=jnp.float32)
            noise = jnp.where(t_scalar > 0, noise * self.var_temp, 0.0)
            img = mean + jnp.exp(0.5 * log_var) * noise
            return img, None

        return step

    # -- DDIM sampling (goal_diffusion.py:601-641) ------------------------

    def ddim_time_pairs(self) -> np.ndarray:
        """(S, 2) int array of (t, t_next) pairs, t_next possibly -1.

        Matches `goal_diffusion.py:604-606`: times = linspace(-1, T-1, S+1)
        truncated to ints, reversed, consecutive pairs.
        """
        total, s = self.num_timesteps, self.effective_sampling_timesteps
        times = np.linspace(-1, total - 1, s + 1)
        times = list(reversed(times.astype(int).tolist()))
        return np.asarray(list(zip(times[:-1], times[1:])), dtype=np.int32)

    def ddim_sample(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: Tuple[int, ...],
        x_cond: jax.Array,
        task_embed: jax.Array,
        init_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        pairs = jnp.asarray(self.ddim_time_pairs())
        rng, init_rng = jax.random.split(rng)
        img = (
            init_noise if init_noise is not None
            else jax.random.normal(init_rng, shape, dtype=jnp.float32)
        )
        step_rngs = jax.random.split(rng, pairs.shape[0])
        img, _ = jax.lax.scan(
            self._ddim_step_fn(model_fn, x_cond, task_embed),
            img, (pairs, step_rngs), unroll=self.scan_unroll,
        )
        return self._unnormalize(img)

    def _ddim_step_fn(self, model_fn, x_cond, task_embed):
        """One DDIM step as a scan body (see `_p_step_fn`)."""
        eta = self.ddim_sampling_eta
        acp = self.schedule.alphas_cumprod

        def step(img, inputs):
            pair, step_rng = inputs
            time, time_next = pair[0], pair[1]
            t = jnp.full((img.shape[0],), time, dtype=jnp.int32)
            pred_noise, x_start = self.model_predictions(
                model_fn, img, t, x_cond, task_embed,
                clip_x_start=False, rederive_pred_noise=True,
            )
            alpha = acp[time]
            alpha_next = jnp.where(time_next < 0, 1.0, acp[jnp.maximum(time_next, 0)])
            if eta == 0.0:
                # deterministic DDIM: sigma is exactly zero, but XLA cannot
                # fold `0 * sqrt(...)` (NaN semantics) or the threefry that
                # feeds `sigma * noise` — skip both at trace time so the
                # chain never pays per-step RNG over the full video tensor
                c = jnp.sqrt(jnp.maximum(1.0 - alpha_next, 0.0))
                stepped = x_start * jnp.sqrt(alpha_next) + c * pred_noise
            else:
                sigma = eta * jnp.sqrt(
                    (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
                )
                c = jnp.sqrt(jnp.maximum(1.0 - alpha_next - sigma**2, 0.0))
                noise = jax.random.normal(step_rng, img.shape, dtype=jnp.float32)
                stepped = (
                    x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
                )
            # at the final (t, -1) pair the reference returns x_start directly
            img = jnp.where(time_next < 0, x_start, stepped)
            return img, None

        return step

    def sample(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: Tuple[int, ...],
        x_cond: jax.Array,
        task_embed: jax.Array,
    ) -> jax.Array:
        """Sampler dispatch + clamp to [0, 1] (`goal_diffusion.py:644-650`)."""
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        pred = fn(model_fn, rng, shape, x_cond, task_embed)
        return jnp.clip(pred, 0.0, 1.0)

    # -- chunked sampling (explore-cycle pipelining) ------------------------
    #
    # The one-scan samplers above dispatch the whole denoise chain as ONE
    # device program, which monopolizes a single chip for the full chain
    # duration. The exploration pipeline instead dispatches the chain in
    # contiguous chunks, interleaving them with the rollout phase's policy
    # programs so the chip stays busy during host sim/readback gaps
    # (trainer `pipeline_explore`). The three methods below split
    # `sample()` into (inputs, chunk-scan, finish) such that running every
    # chunk in order reproduces `sample()`'s computation sequence exactly —
    # same keys, same step bodies, same clamp.

    def sample_step_inputs(self, rng, shape):
        """(x_T, per-step scan operands) with the EXACT key derivation of
        `p_sample_loop`/`ddim_sample` above."""
        rng, init_rng = jax.random.split(rng)
        img = jax.random.normal(init_rng, shape, dtype=jnp.float32)
        if self.is_ddim_sampling:
            pairs = jnp.asarray(self.ddim_time_pairs())
            step_rngs = jax.random.split(rng, pairs.shape[0])
            return img, (pairs, step_rngs)
        timesteps = jnp.arange(self.num_timesteps - 1, -1, -1)
        step_rngs = jax.random.split(rng, self.num_timesteps)
        return img, (timesteps, step_rngs)

    def sample_scan_chunk(self, model_fn, img, inputs, x_cond, task_embed):
        """Run one contiguous slice of the sampler's steps."""
        step = (
            self._ddim_step_fn(model_fn, x_cond, task_embed)
            if self.is_ddim_sampling
            else self._p_step_fn(model_fn, x_cond, task_embed)
        )
        img, _ = jax.lax.scan(step, img, inputs, unroll=self.scan_unroll)
        return img

    def sample_finish(self, img):
        return jnp.clip(self._unnormalize(img), 0.0, 1.0)

    # -- training (goal_diffusion.py:690-733) ------------------------------

    def p_losses(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x_start: jax.Array,
        x_cond: jax.Array,
        task_embed: jax.Array,
        t: Optional[jax.Array] = None,
        sample_weights: Optional[jax.Array] = None,
        return_per_sample: bool = False,
    ) -> jax.Array:
        """Weighted denoising loss. `x_start` is expected in [0, 1] and is
        mapped to [-1, 1] here when `auto_normalize` (mirrors
        `goal_diffusion.py:718-724`).

        `sample_weights` (B,) multiplies per-sample losses (importance
        weights from a schedule resampler, `resample.py` semantics);
        `return_per_sample` additionally returns the unweighted per-sample
        losses for resampler history updates."""
        b = x_start.shape[0]
        t_rng, noise_rng = jax.random.split(rng)
        if t is None:
            t = jax.random.randint(t_rng, (b,), 0, self.num_timesteps)
        x_start = self._normalize(x_start)
        noise = jax.random.normal(noise_rng, x_start.shape, dtype=x_start.dtype)
        x = self.q_sample(x_start, t, noise)
        model_out = model_fn(_concat_cond(x, x_cond), t, task_embed)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)

        if self.loss_type == "l2":
            loss = (model_out - target) ** 2
        elif self.loss_type == "l1":
            loss = jnp.abs(model_out - target)
        else:
            raise ValueError(f"invalid loss type {self.loss_type!r}")
        loss = loss.reshape(b, -1).mean(axis=1)
        weight = self.schedule.loss_weight(
            self.objective, self.min_snr_loss_weight, self.min_snr_gamma
        )[t]
        weighted = loss * weight
        if sample_weights is not None:
            weighted = weighted * sample_weights
        if return_per_sample:
            return weighted.mean(), loss
        return weighted.mean()

    # -- range mapping -----------------------------------------------------

    def _normalize(self, x):
        return x * 2.0 - 1.0 if self.auto_normalize else x

    def _unnormalize(self, x):
        return (x + 1.0) * 0.5 if self.auto_normalize else x
