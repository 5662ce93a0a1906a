"""Image-mode guided-diffusion U-Net and classifier (Flax, NHWC).

Capability-level TPU re-design of the reference's 2D image path:
`flowdiffusion/guided_diffusion/guided_diffusion/unet.py:396-702`
(`UNetModel` with class conditioning), `unet.py:704-830`
(`EncoderUNetModel` classifier), and the super-resolution wrapper
`unet.py:833-856` (`SuperResModel`: concat bilinear-upsampled low-res).

These back the guided-diffusion script surface (image_train / image_sample /
super_res_* / classifier_*, see `scripts/guided/`). Deliberate TPU choices:

- NHWC layout (XLA:TPU native conv layout), channels-last everywhere,
- compute dtype configurable (bf16 on TPU), GroupNorm statistics fp32
  (the reference's GroupNorm32 discipline, `unet.py:126-129`),
- attention is one fused `jax.nn.dot_product_attention`-shaped einsum chain
  over (B, H*W, heads, dh) instead of the reference's reshaped 1D conv QKV
  (`unet.py:263-330`) — same math, MXU-friendly shapes,
- up/downsampling via `jax.image.resize` + conv / strided conv
  (`unet.py:69-123`).

Weight compatibility with OpenAI checkpoints is NOT a goal here (the
reference vendors these models untrained as dead weight, SURVEY.md §2.9);
behavioral parity of the capability surface is.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2a_tpu.models.video_unet import GroupNorm32, timestep_embedding


def _groups(c: int) -> int:
    """32 groups at production widths (`nn.py:160-167`); the largest
    divisor <= 32 at the tiny widths hermetic tests use."""
    g = min(32, c)
    while c % g:
        g -= 1
    return g


class ResBlock2D(nn.Module):
    """GN -> SiLU -> conv -> (+emb, scale-shift optional) -> GN -> SiLU ->
    conv + skip, with optional built-in resampling (`unet.py:148-261`)."""

    features: int
    emb_dim: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    def _resample(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if self.up:
            return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        if self.down:
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        h = GroupNorm32(num_groups=_groups(cin), with_silu=True, name="in_norm")(x)
        h = self._resample(h)
        x = self._resample(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)

        emb_out = nn.Dense(
            self.features * (2 if self.use_scale_shift_norm else 1),
            dtype=self.dtype, name="emb_dense",
        )(nn.silu(emb))[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(num_groups=_groups(self.features), name="out_norm")(h)
            h = h * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(num_groups=_groups(self.features), with_silu=True,
                            name="out_norm")(h)
        h = nn.Conv(
            self.features, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="out_conv",
        )(h)

        if cin != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        name="skip_conv")(x)
        return x + h


class AttentionBlock2D(nn.Module):
    """Multi-head self-attention over spatial positions
    (`unet.py:263-330`), fp32 softmax, zero-init output projection."""

    num_head_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        dh = c // heads
        y = GroupNorm32(num_groups=_groups(c), name="norm")(x).reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, h * w, heads, 3 * dh), 3, axis=-1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(logits / jnp.sqrt(dh), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h * w, c)
        o = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     name="proj")(o)
        return x + o.reshape(b, h, w, c)


class ImageUNet(nn.Module):
    """2D guided-diffusion U-Net (`unet.py:396-702`).

    `num_classes` enables class conditioning (label embedding added to the
    timestep embedding, `unet.py:538-541`); `learn_sigma` callers set
    `out_channels = 2 * in_channels`. Super-res conditioning is the caller
    concatenating the upsampled low-res image on channels
    (`unet.py:833-856`, see `superres_condition`).
    """

    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_classes: Optional[int] = None
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    dtype: jnp.dtype = jnp.float32
    # Gradient checkpointing: rematerialize each ResBlock/attention block in
    # the backward pass (the reference's `use_checkpoint`,
    # `.../guided_diffusion/nn.py:192-236` wired at `unet.py:160,174,184`).
    use_checkpoint: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        y: Optional[jax.Array] = None,
    ) -> jax.Array:
        if (y is not None) != (self.num_classes is not None):
            raise ValueError("y must be passed iff num_classes is set")
        _Res = nn.remat(ResBlock2D) if self.use_checkpoint else ResBlock2D
        _Attn = (
            nn.remat(AttentionBlock2D) if self.use_checkpoint
            else AttentionBlock2D
        )
        mc = self.model_channels
        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense0")(
            emb.astype(self.dtype))
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense1")(
            nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, mc * 4, dtype=self.dtype,
                                 name="label_emb")(y)

        def maybe_attn(h, ds, tag):
            if ds in self.attention_resolutions:
                h = _Attn(self.num_head_channels, self.dtype,
                                     name=f"{tag}_attn")(h)
            return h

        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(x.astype(self.dtype))
        skips = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = _Res(int(mult * mc), mc * 4, self.use_scale_shift_norm,
                               dtype=self.dtype, name=f"down_{level}_{i}")(h, emb)
                h = maybe_attn(h, ds, f"down_{level}_{i}")
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = _Res(int(mult * mc), mc * 4,
                                   self.use_scale_shift_norm, down=True,
                                   dtype=self.dtype,
                                   name=f"down_{level}_down")(h, emb)
                else:
                    h = nn.Conv(int(mult * mc), (3, 3), strides=(2, 2), padding=1,
                                dtype=self.dtype, name=f"down_{level}_down")(h)
                skips.append(h)
                ds *= 2

        mid_ch = int(self.channel_mult[-1] * mc)
        h = _Res(mid_ch, mc * 4, self.use_scale_shift_norm,
                       dtype=self.dtype, name="mid_res0")(h, emb)
        h = _Attn(self.num_head_channels, self.dtype,
                             name="mid_attn")(h)
        h = _Res(mid_ch, mc * 4, self.use_scale_shift_norm,
                       dtype=self.dtype, name="mid_res1")(h, emb)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = _Res(int(mult * mc), mc * 4, self.use_scale_shift_norm,
                               dtype=self.dtype, name=f"up_{level}_{i}")(h, emb)
                h = maybe_attn(h, ds, f"up_{level}_{i}")
            if level:
                if self.resblock_updown:
                    h = _Res(int(mult * mc), mc * 4,
                                   self.use_scale_shift_norm, up=True,
                                   dtype=self.dtype,
                                   name=f"up_{level}_up")(h, emb)
                else:
                    b, hh, ww, cc = h.shape
                    h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                    h = nn.Conv(int(mult * mc), (3, 3), padding=1,
                                dtype=self.dtype, name=f"up_{level}_up")(h)
                ds //= 2

        h = GroupNorm32(num_groups=_groups(h.shape[-1]), with_silu=True,
                        name="out_norm")(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="out_conv",
        )(h).astype(jnp.float32)


def superres_condition(x: jax.Array, low_res: jax.Array) -> jax.Array:
    """SuperResModel conditioning (`unet.py:843-851`): bilinear-upsample the
    low-res image to the model resolution and concat on channels."""
    b, h, w, _ = x.shape
    up = jax.image.resize(low_res, (b, h, w, low_res.shape[-1]), "bilinear")
    return jnp.concatenate([x, up.astype(x.dtype)], axis=-1)


class EncoderUNet(nn.Module):
    """Half-U-Net classifier (`unet.py:704-830`): the down path of
    `ImageUNet` followed by a pooling head. Used as the noisy classifier for
    guided sampling (`classifier_train.py` / `classifier_sample.py`).

    Pools: 'adaptive' (mean-pool -> dense, `unet.py:786-793`), 'attention'
    (QKV attention pool, `:794-802`), 'spatial' (flatten -> MLP, `:803-817`).
    """

    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "adaptive"
    dtype: jnp.dtype = jnp.float32
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array) -> jax.Array:
        _Res = nn.remat(ResBlock2D) if self.use_checkpoint else ResBlock2D
        _Attn = (
            nn.remat(AttentionBlock2D) if self.use_checkpoint
            else AttentionBlock2D
        )
        mc = self.model_channels
        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense0")(
            emb.astype(self.dtype))
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense1")(
            nn.silu(emb))

        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(x.astype(self.dtype))
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = _Res(int(mult * mc), mc * 4, self.use_scale_shift_norm,
                               dtype=self.dtype, name=f"down_{level}_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = _Attn(self.num_head_channels, self.dtype,
                                         name=f"down_{level}_{i}_attn")(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = _Res(int(mult * mc), mc * 4,
                                   self.use_scale_shift_norm, down=True,
                                   dtype=self.dtype,
                                   name=f"down_{level}_down")(h, emb)
                else:
                    h = nn.Conv(int(mult * mc), (3, 3), strides=(2, 2), padding=1,
                                dtype=self.dtype, name=f"down_{level}_down")(h)
                ds *= 2

        mid_ch = int(self.channel_mult[-1] * mc)
        h = _Res(mid_ch, mc * 4, self.use_scale_shift_norm,
                       dtype=self.dtype, name="mid_res0")(h, emb)
        h = _Attn(self.num_head_channels, self.dtype,
                             name="mid_attn")(h)
        h = _Res(mid_ch, mc * 4, self.use_scale_shift_norm,
                       dtype=self.dtype, name="mid_res1")(h, emb)

        if self.pool == "adaptive":
            h = GroupNorm32(num_groups=_groups(h.shape[-1]), with_silu=True,
                            name="head_norm")(h)
            h = jnp.mean(h, axis=(1, 2))
            return nn.Dense(self.out_channels, dtype=self.dtype,
                            kernel_init=nn.initializers.zeros,
                            name="head_dense")(h).astype(jnp.float32)
        if self.pool == "attention":
            h = GroupNorm32(num_groups=_groups(h.shape[-1]), with_silu=True,
                            name="head_norm")(h)
            b, hh, ww, c = h.shape
            tokens = h.reshape(b, hh * ww, c)
            # attention pool: mean token as the query (`unet.py:33-66`)
            q_tok = jnp.concatenate(
                [jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1
            )
            heads = max(c // self.num_head_channels, 1)
            dh = c // heads
            qkv = nn.Dense(3 * c, dtype=self.dtype, name="pool_qkv")(q_tok)
            q, k, v = jnp.split(
                qkv.reshape(b, hh * ww + 1, heads, 3 * dh), 3, axis=-1)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q[:, :1], k)
            probs = jax.nn.softmax(
                logits.astype(jnp.float32) / jnp.sqrt(dh), axis=-1
            ).astype(self.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, c)
            return nn.Dense(self.out_channels, dtype=self.dtype,
                            name="head_dense")(o).astype(jnp.float32)
        if self.pool == "spatial":
            b = h.shape[0]
            h = nn.Dense(2048, dtype=self.dtype, name="head_dense0")(
                h.reshape(b, -1))
            h = nn.relu(h)
            return nn.Dense(self.out_channels, dtype=self.dtype,
                            name="head_dense1")(h).astype(jnp.float32)
        raise ValueError(f"unknown pool {self.pool!r}")
