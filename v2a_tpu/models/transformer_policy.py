"""Transformer action denoiser (diffusion-policy baseline family).

TPU-native counterpart of `TransformerForDiffusion`
(`flowdiffusion/flowdiffusion/diffusion_policy_baseline/
transformer_for_diffusion.py:23-360`), the alternative to the
ConditionalUnet1D denoiser: a pre-LN encoder/decoder transformer where the
noisy action trajectory forms the decoder tokens, and [timestep embedding ;
per-step observation features] form the conditioning tokens. Supported
surface mirrors the torch module: `time_as_cond`, observation conditioning
via `cond_dim > 0`, optional causal self-attention with the reference's
shifted memory mask (`t >= s - 1`), MLP vs transformer conditioning
encoder (`n_cond_layers`), GELU activations, learned position embeddings.

Used with `DiffusionPolicy` by swapping the denoiser: both nets share the
(B, T, input_dim) x timestep x global-cond calling convention.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2a_tpu.models.unet1d import SinusoidalPosEmb, mish


class _MHA(nn.Module):
    n_emb: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask: Optional[jax.Array] = None):
        d = self.n_emb // self.n_head
        b, tq, _ = q_in.shape
        tk = kv_in.shape[1]
        q = nn.Dense(self.n_emb, dtype=self.dtype, name="q")(q_in)
        k = nn.Dense(self.n_emb, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.n_emb, dtype=self.dtype, name="v")(kv_in)
        q = q.reshape(b, tq, self.n_head, d)
        k = k.reshape(b, tk, self.n_head, d)
        v = v.reshape(b, tk, self.n_head, d)
        logits = jnp.einsum(
            "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(d).astype(jnp.float32)
        if mask is not None:
            logits = logits + mask[None, None]
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", w, v).reshape(b, tq, self.n_emb)
        return nn.Dense(self.n_emb, dtype=self.dtype, name="proj")(out)


class _FFN(nn.Module):
    n_emb: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.n_emb, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.n_emb, dtype=self.dtype, name="fc2")(h)


class _EncoderLayer(nn.Module):
    """Pre-LN transformer encoder layer (norm_first=True)."""

    n_emb: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        x = x + _MHA(self.n_emb, self.n_head, self.dtype, name="attn")(h, h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        return x + _FFN(self.n_emb, self.dtype, name="ffn")(h)


class _DecoderLayer(nn.Module):
    """Pre-LN transformer decoder layer: self-attn, cross-attn, FFN."""

    n_emb: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_mask=None, memory_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        x = x + _MHA(self.n_emb, self.n_head, self.dtype, name="self_attn")(
            h, h, self_mask
        )
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        x = x + _MHA(self.n_emb, self.n_head, self.dtype, name="cross_attn")(
            h, memory, memory_mask
        )
        h = nn.LayerNorm(epsilon=1e-5, name="ln3")(x)
        return x + _FFN(self.n_emb, self.dtype, name="ffn")(h)


class TransformerForDiffusion(nn.Module):
    """Same calling convention as `ConditionalUnet1D`:
    (sample (B,T,Di), timestep, global_cond (B,Dc) or per-step cond
    (B,To,Dc)) -> (B, T, Do)."""

    input_dim: int = 7
    output_dim: int = 7
    horizon: int = 16
    n_obs_steps: int = 1
    cond_dim: int = 0
    n_layer: int = 8
    n_head: int = 4
    n_emb: int = 256
    causal_attn: bool = False
    time_as_cond: bool = True
    n_cond_layers: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timestep: jax.Array,
        global_cond: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, t, _ = sample.shape
        obs_as_cond = self.cond_dim > 0
        timestep = jnp.asarray(timestep)
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep[None], (b,))

        time_emb = SinusoidalPosEmb(self.n_emb, name="time_emb")(timestep)
        time_tok = time_emb[:, None].astype(self.dtype)  # (B, 1, E)

        x = nn.Dense(self.n_emb, dtype=self.dtype, name="input_emb")(
            sample.astype(self.dtype)
        )

        causal_mask = None
        if self.causal_attn:
            causal_mask = jnp.where(
                jnp.tril(jnp.ones((t, t), bool)), 0.0, -jnp.inf
            ).astype(jnp.float32)

        if not self.time_as_cond:
            # BERT-style: prepend the time token to the trunk
            x = jnp.concatenate([time_tok, x], axis=1)
            seq_t = t + 1
            pos = self.param(
                "pos_emb", nn.initializers.zeros, (seq_t, self.n_emb),
                jnp.float32,
            )
            x = x + pos[None].astype(x.dtype)
            mask = None
            if self.causal_attn:
                mask = jnp.where(
                    jnp.tril(jnp.ones((seq_t, seq_t), bool)), 0.0, -jnp.inf
                ).astype(jnp.float32)
            for i in range(self.n_layer):
                x = _EncoderLayer(
                    self.n_emb, self.n_head, self.dtype, name=f"enc_{i}"
                )(x, mask)
            x = x[:, 1:]
        else:
            cond_toks = [time_tok]
            if obs_as_cond:
                if global_cond is None:
                    raise ValueError("cond_dim > 0 requires conditioning input")
                cond = global_cond.astype(self.dtype)
                if cond.ndim == 2:
                    cond = cond.reshape(b, self.n_obs_steps, -1)
                cond_toks.append(
                    nn.Dense(self.n_emb, dtype=self.dtype, name="cond_obs_emb")(
                        cond
                    )
                )
            memory = jnp.concatenate(cond_toks, axis=1)
            t_cond = memory.shape[1]
            cond_pos = self.param(
                "cond_pos_emb", nn.initializers.zeros, (t_cond, self.n_emb),
                jnp.float32,
            )
            memory = memory + cond_pos[None].astype(memory.dtype)

            if self.n_cond_layers > 0:
                for i in range(self.n_cond_layers):
                    memory = _EncoderLayer(
                        self.n_emb, self.n_head, self.dtype, name=f"cond_enc_{i}"
                    )(memory)
            else:
                h = nn.Dense(
                    4 * self.n_emb, dtype=self.dtype, name="cond_mlp_in"
                )(memory)
                memory = nn.Dense(
                    self.n_emb, dtype=self.dtype, name="cond_mlp_out"
                )(mish(h))

            pos = self.param(
                "pos_emb", nn.initializers.zeros, (t, self.n_emb), jnp.float32
            )
            x = x + pos[None].astype(x.dtype)

            memory_mask = None
            if self.causal_attn and obs_as_cond:
                # reference's shifted memory mask: action token t may attend
                # to cond token s iff t >= s - 1 (time token is s=0)
                tt, ss = jnp.meshgrid(
                    jnp.arange(t), jnp.arange(t_cond), indexing="ij"
                )
                memory_mask = jnp.where(
                    tt >= ss - 1, 0.0, -jnp.inf
                ).astype(jnp.float32)

            for i in range(self.n_layer):
                x = _DecoderLayer(
                    self.n_emb, self.n_head, self.dtype, name=f"dec_{i}"
                )(x, memory, causal_mask, memory_mask)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x.astype(jnp.float32))
        return nn.Dense(
            self.output_dim, dtype=jnp.float32, name="head"
        )(x)
