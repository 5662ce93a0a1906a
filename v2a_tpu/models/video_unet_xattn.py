"""Cross-attention-conditioned 3D video U-Net (alternative backbone).

The reference vendors a second video-model family: the HF-diffusers
`UNet3DConditionModel` stack (`flowdiffusion/flowdiffusion/model/
unet_3d_condition.py:556`, `unet_3d_blocks.py`, `transformer_temporal.py` —
SURVEY §2.9, unused by the Libero pipeline but part of the capability
surface). This module is its TPU-native counterpart, compact but structurally
faithful:

- per-level: ResNet block (per-frame 2D convs + temporal conv) -> spatial
  transformer with self-attention AND cross-attention over the text tokens
  (`encoder_hidden_states`) -> temporal transformer (frames attend to each
  other per pixel block);
- text conditioning enters through cross-attention instead of the
  Perceiver-pooled additive embedding of the primary backbone
  (`models/video_unet.py`) — the two families are drop-in interchangeable
  under `ops/gaussian_diffusion.py` (same `fn(x, t, task_tokens)` contract).

Channels-last, bf16-ready, GroupNorm/softmax in fp32.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2a_tpu.models.video_unet import GroupNorm32, timestep_embedding


class _Attention(nn.Module):
    """Multi-head attention, optionally cross (kv from context)."""

    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        d = self.dim // self.heads
        b, n, _ = x.shape
        m = ctx.shape[1]
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q = q.reshape(b, n, self.heads, d)
        k = k.reshape(b, m, self.heads, d)
        v = v.reshape(b, m, self.heads, d)
        logits = jnp.einsum(
            "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(d)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", w, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class _TransformerBlock(nn.Module):
    """Pre-LN: self-attn -> cross-attn -> GEGLU feed-forward (the
    BasicTransformerBlock of `attention_processor.py`)."""

    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = x + _Attention(self.dim, self.heads, self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = x + _Attention(self.dim, self.heads, self.dtype, name="cross_attn")(
            h, context
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln3")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        gate = nn.Dense(self.dim * 8, dtype=self.dtype, name="ff_in")(h)
        a, g = jnp.split(gate, 2, axis=-1)
        h = a * nn.gelu(g, approximate=False)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)


class SpatialCrossAttnBlock(nn.Module):
    """Per-frame spatial transformer with text cross-attention
    (`Transformer2DModel` in the diffusers stack): tokens = H*W pixels,
    context tokens broadcast per frame."""

    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, f, h, w, c = x.shape
        y = x.reshape(b * f, h * w, c)
        y = GroupNorm32(name="norm")(y).astype(self.dtype)
        y = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(y)
        ctx = jnp.repeat(context, f, axis=0)  # (B*F, L, Dctx)
        y = _TransformerBlock(self.dim, self.heads, self.dtype, name="block")(
            y, ctx
        )
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return x + y.reshape(b, f, h, w, c)


class TemporalAttnBlock(nn.Module):
    """Frames attend to each other at every spatial location
    (`TransformerTemporalModel`)."""

    dim: int
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        y = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        y_n = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            y.astype(jnp.float32)
        ).astype(self.dtype)
        y = y + _Attention(self.dim, self.heads, self.dtype, name="attn")(y_n)
        return y.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)


class ResBlock2p1D(nn.Module):
    """Per-frame 2D ResNet block + temporal conv (`resnet.py` +
    `TemporalConvLayer` of the diffusers stack), FiLM'd by the timestep."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        b, f, h, w, c = x.shape
        y = GroupNorm32(with_silu=True, name="norm1")(x).astype(self.dtype)
        y = y.reshape(b * f, h, w, c)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(y)
        y = y.reshape(b, f, h, w, self.out_channels)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_proj")(
            nn.silu(emb.astype(self.dtype))
        )
        y = y + t[:, None, None, None, :]
        y = GroupNorm32(with_silu=True, name="norm2")(y).astype(self.dtype)
        y = y.reshape(b * f, h, w, self.out_channels)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = y.reshape(b, f, h, w, self.out_channels)
        # temporal mixing (identity-init 1D conv over frames)
        tc = y.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, self.out_channels)
        from v2a_tpu.models.video_unet import _dirac_init

        tc = nn.Conv(
            self.out_channels, (3,), padding=1, dtype=self.dtype,
            kernel_init=_dirac_init, bias_init=nn.initializers.zeros,
            name="temporal_conv",
        )(tc)
        y = tc.reshape(b, h, w, f, self.out_channels).transpose(0, 3, 1, 2, 4)
        if c != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="skip"
            )(x.reshape(b * f, h, w, c)).reshape(b, f, h, w, self.out_channels)
        return x + y


class VideoUNetXAttn(nn.Module):
    """The alternative video backbone. Same calling convention as
    `VideoUNet`: (B, F, H, W, in_channels) x timesteps x task tokens ->
    (B, F, H, W, out_channels)."""

    in_channels: int = 6
    out_channels: int = 3
    block_out_channels: Sequence[int] = (64, 128, 256)
    layers_per_block: int = 1
    attn_heads: int = 8
    context_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    # Gradient checkpointing: block-level jax.remat (the reference's
    # `use_checkpoint`, `.../guided_diffusion/nn.py:192-236`).
    use_checkpoint: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        task_tokens: jax.Array,
    ) -> jax.Array:
        ckpt = self.use_checkpoint
        _Res = nn.remat(ResBlock2p1D) if ckpt else ResBlock2p1D
        _XAttn = nn.remat(SpatialCrossAttnBlock) if ckpt else SpatialCrossAttnBlock
        _TAttn = nn.remat(TemporalAttnBlock) if ckpt else TemporalAttnBlock
        ch0 = self.block_out_channels[0]
        temb_dim = ch0 * 4
        emb = timestep_embedding(timesteps, ch0)
        emb = nn.Dense(temb_dim, dtype=self.dtype, name="time_dense0")(
            emb.astype(self.dtype)
        )
        emb = nn.Dense(temb_dim, dtype=self.dtype, name="time_dense1")(
            nn.silu(emb)
        )
        ctx = nn.Dense(
            self.block_out_channels[-1], dtype=self.dtype, name="context_proj"
        )(task_tokens.astype(self.dtype))

        b, f, h, w, _ = x.shape
        y = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype).reshape(b * f, h, w, -1)
        ).reshape(b, f, h, w, ch0)

        skips = [y]
        for lv, ch in enumerate(self.block_out_channels):
            for i in range(self.layers_per_block):
                y = _Res(ch, self.dtype, name=f"down_{lv}_res{i}")(y, emb)
                y = _XAttn(
                    ch, self.attn_heads, self.dtype, name=f"down_{lv}_xattn{i}"
                )(y, ctx)
                y = _TAttn(
                    ch, dtype=self.dtype, name=f"down_{lv}_tattn{i}"
                )(y)
                skips.append(y)
            if lv != len(self.block_out_channels) - 1:
                bb, ff, hh, ww, cc = y.shape
                y = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name=f"down_{lv}_downsample",
                )(y.reshape(bb * ff, hh, ww, cc)).reshape(
                    bb, ff, hh // 2, ww // 2, cc
                )
                skips.append(y)

        mid_ch = self.block_out_channels[-1]
        y = _Res(mid_ch, self.dtype, name="mid_res0")(y, emb)
        y = _XAttn(
            mid_ch, self.attn_heads, self.dtype, name="mid_xattn"
        )(y, ctx)
        y = _TAttn(mid_ch, dtype=self.dtype, name="mid_tattn")(y)
        y = _Res(mid_ch, self.dtype, name="mid_res1")(y, emb)

        for lv, ch in reversed(list(enumerate(self.block_out_channels))):
            for i in range(self.layers_per_block + 1):
                y = jnp.concatenate([y, skips.pop()], axis=-1)
                y = _Res(ch, self.dtype, name=f"up_{lv}_res{i}")(y, emb)
                y = _XAttn(
                    ch, self.attn_heads, self.dtype, name=f"up_{lv}_xattn{i}"
                )(y, ctx)
                y = _TAttn(
                    ch, dtype=self.dtype, name=f"up_{lv}_tattn{i}"
                )(y)
            if lv:
                bb, ff, hh, ww, cc = y.shape
                y = jax.image.resize(
                    y, (bb, ff, hh * 2, ww * 2, cc), method="nearest"
                )
                y = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"up_{lv}_upsample",
                )(y.reshape(bb * ff, hh * 2, ww * 2, cc)).reshape(
                    bb, ff, hh * 2, ww * 2, cc
                )
        assert not skips

        y = GroupNorm32(with_silu=True, name="out_norm")(y).astype(self.dtype)
        bb, ff, hh, ww, cc = y.shape
        y = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
            name="conv_out",
        )(y.reshape(bb * ff, hh, ww, cc))
        return y.reshape(bb, ff, hh, ww, self.out_channels).astype(jnp.float32)
