"""Conditional 1D U-Net over action trajectories (Flax).

TPU-native re-design of the reference `ConditionalUnet1D`
(`diffuser/diffusion_policy/model/conditional_unet1d.py:69-246`) and its
building blocks (`conv1d_components.py:7-41`,
`positional_embedding.py:5-17`). Differences from the torch original, all
deliberate:

- channels-last layout: activations are (B, T, C); Conv uses
  `flax.linen.Conv` over the time axis, which XLA maps onto the MXU,
- compute dtype is configurable (bf16 on TPU) while parameters and
  GroupNorm statistics stay float32,
- identical topology and hyperparameter surface so torch checkpoints can be
  converted 1:1: per level 2 FiLM residual blocks + strided-conv
  down/transposed-conv up, two mid blocks, skip concatenation, and the
  reference's quirk that the outermost skip level is never consumed
  (up path has len(down_dims)-1 stages).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """Diffusion-timestep embedding, [sin | cos] ordering with the
    `(half_dim - 1)` denominator of `positional_embedding.py:10-17`."""

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        scale = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm -> Mish (`conv1d_components.py:24-41`).

    GroupNorm runs in float32 for bf16-safe statistics.
    """

    features: int
    kernel_size: int = 3
    n_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features,
            (self.kernel_size,),
            padding=self.kernel_size // 2,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.GroupNorm(
            num_groups=self.n_groups, epsilon=1e-5, dtype=jnp.float32, name="norm"
        )(x.astype(jnp.float32))
        return mish(x).astype(self.dtype)


class ConditionalResidualBlock1D(nn.Module):
    """FiLM-conditioned residual block
    (`conditional_unet1d.py:14-66`): block -> (scale, bias) from cond ->
    block -> + 1x1-projected residual."""

    features: int
    kernel_size: int = 3
    n_groups: int = 8
    cond_predict_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        out = Conv1dBlock(
            self.features, self.kernel_size, self.n_groups, self.dtype, name="block0"
        )(x)
        cond_channels = self.features * 2 if self.cond_predict_scale else self.features
        embed = nn.Dense(cond_channels, dtype=self.dtype, name="cond_encoder")(
            mish(cond)
        )
        embed = embed[:, None, :]  # (B, 1, C) broadcasting over time
        if self.cond_predict_scale:
            scale, bias = jnp.split(embed, 2, axis=-1)
            out = scale * out + bias
        else:
            out = out + embed
        out = Conv1dBlock(
            self.features, self.kernel_size, self.n_groups, self.dtype, name="block1"
        )(out)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,), dtype=self.dtype, name="residual_conv")(x)
        return out + x


class Downsample1d(nn.Module):
    """Strided conv, halves T (`conv1d_components.py:7-13`)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.features, (3,), strides=(2,), padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample1d(nn.Module):
    """Transposed conv kernel 4 stride 2 (`conv1d_components.py:15-21`).

    flax ConvTranspose padding ((2,2)) reproduces torch's
    ConvTranspose1d(kernel=4, stride=2, padding=1): output length doubles and
    (with the kernel flipped along k at conversion time) values match torch
    exactly — verified by dirac-probe alignment tests.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.ConvTranspose(
            self.features, (4,), strides=(2,), padding=((2, 2),),
            dtype=self.dtype, name="conv",
        )(x)


class ConditionalUnet1D(nn.Module):
    """The action denoiser. Input (B, T, input_dim) noisy action trajectory,
    scalar/vector timestep, global conditioning (B, global_cond_dim);
    output (B, T, input_dim) epsilon (or sample) prediction.

    Hyperparameters mirror `conditional_unet1d.py:69-160` with the Libero
    YAML values as defaults
    (`config/diff_policy/lb_train_diffusion_unet_image_orn10.yaml:95-103`).
    """

    input_dim: int = 7
    down_dims: Sequence[int] = (256, 512, 1024)
    diffusion_step_embed_dim: int = 128
    kernel_size: int = 5
    n_groups: int = 8
    cond_predict_scale: bool = True
    no_down_up: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timestep: jax.Array,
        global_cond: Optional[jax.Array] = None,
    ) -> jax.Array:
        b = sample.shape[0]
        timestep = jnp.asarray(timestep)
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep[None], (b,))

        dsed = self.diffusion_step_embed_dim
        t_emb = SinusoidalPosEmb(dsed, name="pos_emb")(timestep)
        t_emb = nn.Dense(dsed * 4, dtype=self.dtype, name="time_dense0")(
            t_emb.astype(self.dtype)
        )
        t_emb = nn.Dense(dsed, dtype=self.dtype, name="time_dense1")(mish(t_emb))

        if global_cond is not None:
            global_feature = jnp.concatenate(
                [t_emb, global_cond.astype(self.dtype)], axis=-1
            )
        else:
            global_feature = t_emb

        all_dims = [self.input_dim] + list(self.down_dims)
        in_out = list(zip(all_dims[:-1], all_dims[1:]))

        x = sample.astype(self.dtype)
        skips = []
        for idx, (_, dim_out) in enumerate(in_out):
            is_last = idx >= len(in_out) - 1
            x = ConditionalResidualBlock1D(
                dim_out, self.kernel_size, self.n_groups,
                self.cond_predict_scale, self.dtype, name=f"down_{idx}_res0",
            )(x, global_feature)
            x = ConditionalResidualBlock1D(
                dim_out, self.kernel_size, self.n_groups,
                self.cond_predict_scale, self.dtype, name=f"down_{idx}_res1",
            )(x, global_feature)
            skips.append(x)
            if not is_last and not self.no_down_up:
                x = Downsample1d(dim_out, self.dtype, name=f"down_{idx}_downsample")(x)

        mid_dim = all_dims[-1]
        x = ConditionalResidualBlock1D(
            mid_dim, self.kernel_size, self.n_groups, self.cond_predict_scale,
            self.dtype, name="mid_res0",
        )(x, global_feature)
        x = ConditionalResidualBlock1D(
            mid_dim, self.kernel_size, self.n_groups, self.cond_predict_scale,
            self.dtype, name="mid_res1",
        )(x, global_feature)

        # the reference's up path iterates reversed(in_out[1:]) so the first
        # skip (level 0) is intentionally never popped
        # (`conditional_unet1d.py:146-160`)
        for idx, (dim_in, _) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ConditionalResidualBlock1D(
                dim_in, self.kernel_size, self.n_groups,
                self.cond_predict_scale, self.dtype, name=f"up_{idx}_res0",
            )(x, global_feature)
            x = ConditionalResidualBlock1D(
                dim_in, self.kernel_size, self.n_groups,
                self.cond_predict_scale, self.dtype, name=f"up_{idx}_res1",
            )(x, global_feature)
            if not self.no_down_up:
                x = Upsample1d(dim_in, self.dtype, name=f"up_{idx}_upsample")(x)

        x = Conv1dBlock(
            self.down_dims[0], self.kernel_size, self.n_groups, self.dtype,
            name="final_block",
        )(x)
        x = nn.Conv(self.input_dim, (1,), dtype=self.dtype, name="final_conv")(x)
        return x.astype(jnp.float32)
