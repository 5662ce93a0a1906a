"""Perceiver resampler for pooling CLIP text tokens (Flax).

Re-design of the imagen-pytorch `PerceiverResampler` the video U-Net uses
for task conditioning
(`flowdiffusion/flowdiffusion/guided_diffusion/guided_diffusion/imagen.py:
254-372`): 64 learned latents + 4 latents derived from the mean-pooled
sequence, 2 layers of {cross-attention over [tokens ; latents] with
qk-l2norm and learned per-dim scales, gated feed-forward}, gain-only
LayerNorms (no bias) exactly as the torch original.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GainLayerNorm(nn.Module):
    """imagen's LayerNorm (`imagen.py:198-213`): gain `g` only, biased
    variance, dtype-dependent eps, computed in float32."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.var(x32, axis=-1, keepdims=True)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        eps = 1e-5
        out = (x32 - mean) * jax.lax.rsqrt(var + eps) * g
        return out.astype(self.dtype)


def _l2norm(t: jax.Array) -> jax.Array:
    return t / jnp.maximum(
        jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12
    )


class PerceiverAttention(nn.Module):
    """`imagen.py:254-321`: latents query a concat of [tokens ; latents];
    qk l2-normalized then rescaled by learned per-dim-head vectors; fixed
    logit scale 8."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    scale: float = 8.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_latents")(
            latents.astype(jnp.float32)
        ).astype(self.dtype)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(
            inner * 2, use_bias=False, dtype=self.dtype, name="to_kv"
        )(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head)

        q, k, v = map(split_heads, (q, k, v))
        q_scale = self.param(
            "q_scale", nn.initializers.ones, (self.dim_head,), jnp.float32
        )
        k_scale = self.param(
            "k_scale", nn.initializers.ones, (self.dim_head,), jnp.float32
        )
        q = _l2norm(q.astype(jnp.float32)) * q_scale
        k = _l2norm(k.astype(jnp.float32)) * k_scale

        sim = jnp.einsum("bihd,bjhd->bhij", q, k) * self.scale
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        b, n = out.shape[0], out.shape[1]
        out = out.reshape(b, n, inner)
        out = nn.Dense(
            self.dim, use_bias=False, dtype=self.dtype, name="to_out"
        )(out)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_norm")(
            out.astype(jnp.float32)
        ).astype(self.dtype)


class FeedForward(nn.Module):
    """`imagen.py:1009-1017`: LN -> Dense(4x, no bias) -> GELU -> LN ->
    Dense(dim, no bias), all gain-only LayerNorms."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.dim * self.mult)
        x = GainLayerNorm(self.dim, self.dtype, name="norm_in")(x)
        x = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="dense_in")(x)
        x = nn.gelu(x, approximate=False)
        x = GainLayerNorm(hidden, self.dtype, name="norm_hidden")(x)
        return nn.Dense(
            self.dim, use_bias=False, dtype=self.dtype, name="dense_out"
        )(x)


class PerceiverResampler(nn.Module):
    """`imagen.py:321-372` with the Libero defaults: 64 latents, 4
    mean-pooled latents, depth given by the caller (2), dim_head 64,
    heads 8, learned absolute position embeddings over tokens."""

    dim: int
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    num_latents_mean_pooled: int = 4
    max_seq_len: int = 512
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        b, n, _ = x.shape
        pos_emb = self.param(
            "pos_emb",
            nn.initializers.normal(1.0),
            (self.max_seq_len, self.dim),
            jnp.float32,
        )
        x_with_pos = x + pos_emb[:n][None].astype(x.dtype)

        latents = self.param(
            "latents",
            nn.initializers.normal(1.0),
            (self.num_latents, self.dim),
            jnp.float32,
        )
        latents = jnp.broadcast_to(
            latents[None].astype(x.dtype), (b, self.num_latents, self.dim)
        )

        if self.num_latents_mean_pooled > 0:
            if mask is None:
                pooled = x.mean(axis=1)
            else:
                denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1e-5)
                pooled = (x * mask[..., None]).sum(axis=1) / denom
            pooled = GainLayerNorm(self.dim, self.dtype, name="pool_norm")(pooled)
            pooled_latents = nn.Dense(
                self.dim * self.num_latents_mean_pooled, dtype=self.dtype,
                name="pool_proj",
            )(pooled).reshape(b, self.num_latents_mean_pooled, self.dim)
            latents = jnp.concatenate([pooled_latents, latents], axis=-2)

        for i in range(self.depth):
            latents = PerceiverAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                dtype=self.dtype, name=f"attn_{i}",
            )(x_with_pos, latents) + latents
            latents = FeedForward(
                self.dim, self.ff_mult, self.dtype, name=f"ff_{i}"
            )(latents) + latents
        return latents
