"""Goal-conditioned action-diffusion policy: loss and action sampling as
pure jitted functions.

TPU-native re-design of `DiffusionUnetImagePolicy`
(`diffuser/diffusion_policy/diffusion_unet_image_policy.py:15-283`). The
torch original is a stateful nn.Module whose `conditional_sample` runs a
Python loop of scheduler steps on device; here:

- the observation encoder runs ONCE per prediction and the denoising chain
  is a single `lax.scan` over precomputed (t, prev_t) tables — one compiled
  program for the whole 8-step DDIM rollout call,
- normalization constants are folded into the jitted functions,
- randomness is explicit key plumbing,
- `PolicyConfig` carries the YAML surface of
  `config/diff_policy/lb_train_diffusion_unet_image_orn10.yaml`.

Batch convention (channels-last):
    obs:    {key: (B, H, W, 3)} float32 in [0, 1]
    action: (B, horizon, action_dim) float32 in action units
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from v2a_tpu.models.normalizer import (
    LimitsNormalizer,
    image_normalizer,
    lb_action_normalizer,
)
from v2a_tpu.models.unet1d import ConditionalUnet1D
from v2a_tpu.models.vision import MultiImageObsEncoder, VisualCore
from v2a_tpu.ops.action_scheduler import DDIMScheduler, DDPMScheduler

Params = Any

# Run the per-key VisualCore trunks as ONE vmapped trunk over a stacked key
# axis: jax's conv batching rule merges the key dim into a single grouped
# convolution (feature_group_count = n_keys), so every ResNet layer issues
# one conv with doubled M instead of two sequential small convs. Parameter
# layout is untouched — the per-key subtrees are stacked functionally at
# apply time (weight-stack traffic is ~90 MB/step of HBM, noise next to the
# op-count halving). Off by default pending on-chip measurement (PERF.md).
PERF_VMAP_ENC = os.environ.get("V2A_VMAP_ENC", "0") == "1"


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    """Hyperparameter surface of the policy YAML
    (`config/diff_policy/lb_train_diffusion_unet_image_orn10.yaml`)."""

    action_dim: int = 7
    horizon: int = 16
    n_action_steps: int = 8
    n_obs_steps: int = 1
    obs_keys: Tuple[str, ...] = ("img_obs_1", "img_goal_1")
    image_size: Tuple[int, int] = (128, 128)
    num_train_timesteps: int = 100
    num_inference_steps: int = 100
    num_inference_steps_ddim: int = 8
    beta_schedule: str = "squaredcos_cap_v2"
    diffusion_step_embed_dim: int = 128
    down_dims: Tuple[int, ...] = (256, 512, 1024)
    kernel_size: int = 5
    n_groups: int = 8
    cond_predict_scale: bool = True
    obs_feature_dim: int = 64
    num_kp: int = 32
    prediction_type: str = "epsilon"
    action_orn01: bool = False
    dtype: str = "float32"
    # vision trunk stages; default = ResNet-18 (the release config).
    # Smaller tuples give the shallow backbones robomimic's configurable
    # VisualCore supports — used by the hermetic learning-gate tests.
    vision_stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)
    vision_stage_features: Tuple[int, ...] = (64, 128, 256, 512)
    # eval-time DDPM sampling temperature (`plan_lb.py:70`)
    ddpm_var_temp: float = 1.0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def global_cond_dim(self) -> int:
        return self.obs_feature_dim * len(self.obs_keys) * self.n_obs_steps


class PolicyNets(nn.Module):
    """Container module: obs encoder + action U-Net under one param tree."""

    config: PolicyConfig

    def setup(self):
        cfg = self.config
        self.obs_encoder = MultiImageObsEncoder(
            rgb_keys=tuple(cfg.obs_keys),
            feature_dimension=cfg.obs_feature_dim,
            num_kp=cfg.num_kp,
            dtype=cfg.compute_dtype,
            stage_sizes=tuple(cfg.vision_stage_sizes),
            stage_features=tuple(cfg.vision_stage_features),
        )
        self.unet = ConditionalUnet1D(
            input_dim=cfg.action_dim,
            down_dims=tuple(cfg.down_dims),
            diffusion_step_embed_dim=cfg.diffusion_step_embed_dim,
            kernel_size=cfg.kernel_size,
            n_groups=cfg.n_groups,
            cond_predict_scale=cfg.cond_predict_scale,
            dtype=cfg.compute_dtype,
        )

    def encode_obs(self, obs: Dict[str, jax.Array]) -> jax.Array:
        return self.obs_encoder(obs)

    def denoise(self, traj, t, global_cond):
        return self.unet(traj, t, global_cond)

    def __call__(self, obs, traj, t):
        """Init-path: touches both submodules so a single `init` builds the
        full parameter tree."""
        cond = self.encode_obs(obs)
        return self.denoise(traj, t, cond)


@dataclasses.dataclass(frozen=True)
class DiffusionPolicy:
    """The policy = nets + schedulers + normalizers, exposed as pure fns.

    `ddpm_var_temp` mirrors the eval-time hook the reference sets at
    `diffuser/libero/plan_lb.py:70` (attribute on the policy consumed by the
    DDPM sampling path).
    """

    config: PolicyConfig
    nets: PolicyNets
    ddpm: DDPMScheduler
    ddim: DDIMScheduler
    action_norm: LimitsNormalizer
    image_norm: LimitsNormalizer
    ddpm_var_temp: float = 1.0

    @classmethod
    def create(cls, config: Optional[PolicyConfig] = None, **overrides) -> "DiffusionPolicy":
        config = config or PolicyConfig()
        ddpm = DDPMScheduler.create(
            num_train_timesteps=config.num_train_timesteps,
            beta_schedule=config.beta_schedule,
            clip_sample=True,
            variance_type="fixed_small",
            prediction_type=config.prediction_type,
        )
        ddim = DDIMScheduler.create(
            num_train_timesteps=config.num_train_timesteps,
            beta_schedule=config.beta_schedule,
            clip_sample=True,
            set_alpha_to_one=True,
            steps_offset=0,
            prediction_type=config.prediction_type,
        )
        overrides.setdefault("ddpm_var_temp", config.ddpm_var_temp)
        return cls(
            config=config,
            nets=PolicyNets(config),
            ddpm=ddpm,
            ddim=ddim,
            action_norm=lb_action_normalizer(config.action_orn01),
            image_norm=image_normalizer(),
            **overrides,
        )

    # -- initialization ---------------------------------------------------

    def init(self, rng: jax.Array) -> Params:
        cfg = self.config
        h, w = cfg.image_size
        obs = {k: jnp.zeros((1, h, w, 3)) for k in cfg.obs_keys}
        traj = jnp.zeros((1, cfg.horizon, cfg.action_dim))
        t = jnp.zeros((1,), jnp.int32)
        return self.nets.init(rng, obs, traj, t)

    # -- shared pieces ----------------------------------------------------

    def _normalize_obs(self, obs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {k: self.image_norm.normalize(v) for k, v in obs.items()}

    def _encode(self, params: Params, nobs: Dict[str, jax.Array]) -> jax.Array:
        """Obs-encoder apply, optionally via the vmapped stacked-trunk fast
        path (PERF_VMAP_ENC). Both paths consume the SAME parameter tree
        (per-key `enc_<key>` subtrees) and produce bitwise-identical
        sorted-key concatenation semantics
        (`multi_image_obs_encoder.py:130,144-196`)."""
        cfg = self.config
        if not PERF_VMAP_ENC or len(cfg.obs_keys) < 2:
            return self.nets.apply(params, nobs, method=PolicyNets.encode_obs)
        keys = sorted(cfg.obs_keys)
        enc = params["params"]["obs_encoder"]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[enc[f"enc_{k}"] for k in keys]
        )
        imgs = jnp.stack(
            [nobs[k].astype(cfg.compute_dtype) for k in keys]
        )  # (K, B, H, W, 3)
        vc = VisualCore(
            feature_dimension=cfg.obs_feature_dim,
            num_kp=cfg.num_kp,
            dtype=cfg.compute_dtype,
            stage_sizes=tuple(cfg.vision_stage_sizes),
            stage_features=tuple(cfg.vision_stage_features),
        )
        feats = jax.vmap(lambda p, x: vc.apply({"params": p}, x))(
            stacked, imgs
        )  # (K, B, D)
        return jnp.concatenate(list(feats), axis=-1)

    def encode_obs(self, params: Params, obs: Dict[str, jax.Array]) -> jax.Array:
        nobs = self._normalize_obs(obs)
        return self._encode(params, nobs)

    # -- training loss (diffusion_unet_image_policy.py:204-277) -----------

    def loss(
        self,
        params: Params,
        rng: jax.Array,
        batch: Dict[str, Any],
    ) -> jax.Array:
        cfg = self.config
        nobs = self._normalize_obs(batch["obs"])
        nactions = self.action_norm.normalize(batch["action"])
        b = nactions.shape[0]

        global_cond = self._encode(params, nobs)

        t_rng, noise_rng = jax.random.split(rng)
        timesteps = jax.random.randint(t_rng, (b,), 0, cfg.num_train_timesteps)
        noise = jax.random.normal(noise_rng, nactions.shape, dtype=nactions.dtype)
        noisy = self.ddpm.add_noise(nactions, noise, timesteps)

        pred = self.nets.apply(
            params, noisy, timesteps, global_cond, method=PolicyNets.denoise
        )
        target = noise if cfg.prediction_type == "epsilon" else nactions
        return jnp.mean((pred - target) ** 2)

    # -- action sampling (diffusion_unet_image_policy.py:88-201) ----------

    def predict_action(
        self,
        params: Params,
        rng: jax.Array,
        obs: Dict[str, jax.Array],
        use_ddim: bool = True,
    ) -> Dict[str, jax.Array]:
        """Returns {'action': (B, n_action_steps, Da), 'action_pred':
        (B, horizon, Da)} in action units. Encode-once + scan denoise."""
        cfg = self.config
        nobs = self._normalize_obs(obs)
        b = next(iter(obs.values())).shape[0]
        global_cond = self._encode(params, nobs)

        shape = (b, cfg.horizon, cfg.action_dim)
        rng, init_rng = jax.random.split(rng)
        traj = jax.random.normal(init_rng, shape, dtype=jnp.float32)

        if use_ddim:
            ts = self.ddim.timesteps(cfg.num_inference_steps_ddim)
            step_ratio = cfg.num_train_timesteps // cfg.num_inference_steps_ddim
        else:
            ts = self.ddpm.timesteps(cfg.num_inference_steps)
            step_ratio = cfg.num_train_timesteps // cfg.num_inference_steps
        prev_ts = ts - step_ratio
        ts = jnp.asarray(ts, jnp.int32)
        prev_ts = jnp.asarray(prev_ts, jnp.int32)
        step_rngs = jax.random.split(rng, ts.shape[0])

        def step(traj, inputs):
            t, prev_t, step_rng = inputs
            t_vec = jnp.full((b,), t, jnp.int32)
            model_out = self.nets.apply(
                params, traj, t_vec, global_cond, method=PolicyNets.denoise
            )
            if use_ddim:
                traj = self.ddim.step(model_out, t, prev_t, traj)
            else:
                noise = jax.random.normal(step_rng, shape, dtype=jnp.float32)
                traj = self.ddpm.step(
                    model_out, t, prev_t, traj, noise, var_temp=self.ddpm_var_temp
                )
            return traj, None

        traj, _ = jax.lax.scan(step, traj, (ts, prev_ts, step_rngs))

        action_pred = self.action_norm.unnormalize(traj)
        start = cfg.n_obs_steps - 1
        action = jax.lax.dynamic_slice_in_dim(
            action_pred, start, cfg.n_action_steps, axis=1
        )
        return {"action": action, "action_pred": action_pred}

    def param_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
