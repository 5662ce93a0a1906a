"""CLIP text encoder (Flax) + tokenizer plumbing.

The reference conditions the video model on the `last_hidden_state` of a
frozen `openai/clip-vit-base-patch32` text tower
(`diffuser/libero/lb_video_model_utils.py:25-31`,
`diffuser/models/video_model.py:49-53`). This module provides:

- `ClipTextEncoder`: the ViT-B/32 text transformer architecture in Flax
  (vocab 49408, width 512, 12 layers, 8 heads, MLP 2048, max 77 positions,
  quick-GELU, causal + padding masking, final LayerNorm),
- `ClipTokenizerWrapper`: uses the HF `CLIPTokenizer` when its vocab files
  are available locally (zero-egress environments can't download them),
  otherwise a deterministic hashing tokenizer with the same id-space and
  padding semantics so the full pipeline runs hermetically,
- task-string sanitization (strip '-' and '_') matching
  `diffuser/models/helpers.py:27-48`.

Pretrained weights arrive via `convert/torch_import.py`.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VOCAB_SIZE = 49408
MAX_POSITIONS = 77
BOS_ID = 49406
EOS_ID = 49407


def sanitize_task_strings(tasks: List[str]) -> List[str]:
    """`get_no_dash_tasks_str` + `get_no_underscore_tasks_str`
    (`diffuser/models/helpers.py:27-48`)."""
    return [t.replace("-", " ").replace("_", " ") for t in tasks]


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipTextBlock(nn.Module):
    width: int = 512
    heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        b, n, _ = h.shape
        head_dim = self.width // self.heads
        q = nn.Dense(self.width, dtype=self.dtype, name="q")(h)
        k = nn.Dense(self.width, dtype=self.dtype, name="k")(h)
        v = nn.Dense(self.width, dtype=self.dtype, name="v")(h)
        q = q.reshape(b, n, self.heads, head_dim)
        k = k.reshape(b, n, self.heads, head_dim)
        v = v.reshape(b, n, self.heads, head_dim)
        logits = jnp.einsum(
            "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(head_dim)
        logits = logits + attn_bias
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhij,bjhd->bihd", weights, v).reshape(b, n, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="proj")(out)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x + h


class ClipTextEncoder(nn.Module):
    """Returns the last hidden state (B, N, width)."""

    vocab_size: int = VOCAB_SIZE
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_dim: int = 2048
    max_positions: int = MAX_POSITIONS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        b, n = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_positions, self.width),
            jnp.float32,
        )
        x = tok + pos[:n][None].astype(tok.dtype)

        causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
        bias = causal[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
            bias = bias + pad

        for i in range(self.layers):
            x = ClipTextBlock(
                self.width, self.heads, self.mlp_dim, self.dtype,
                name=f"block_{i}",
            )(x, bias)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")(
            x.astype(jnp.float32)
        )


class HashTokenizer:
    """Deterministic fallback tokenizer: whitespace words -> stable ids in
    the CLIP vocab range, with BOS/EOS and longest-padding like the HF call
    `tokenizer(texts, padding=True, truncation=True, max_length=128)` at
    `video_model.py:50`. NOT the real BPE — a stand-in for environments
    without the vocab files; converted checkpoints should ship the real
    tokenizer assets."""

    def __init__(self, max_length: int = MAX_POSITIONS):
        self.max_length = max_length

    def _word_id(self, word: str) -> int:
        digest = hashlib.sha1(word.lower().encode()).digest()
        return int.from_bytes(digest[:4], "little") % (BOS_ID - 1) + 1

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        seqs = []
        for text in texts:
            ids = [BOS_ID] + [self._word_id(w) for w in text.split()][
                : self.max_length - 2
            ] + [EOS_ID]
            seqs.append(ids)
        n = max(len(s) for s in seqs)
        input_ids = np.zeros((len(seqs), n), np.int32)
        mask = np.zeros((len(seqs), n), np.int32)
        for i, s in enumerate(seqs):
            input_ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return input_ids, mask


class ClipTokenizerWrapper:
    """Real HF CLIPTokenizer when local assets exist, else HashTokenizer."""

    def __init__(self, local_path: Optional[str] = None, max_length: int = 77):
        self.max_length = max_length
        self._hf = None
        if local_path:
            # an explicitly requested tokenizer must not silently degrade to
            # the hash stand-in — converted CLIP weights would produce
            # garbage with mismatched token ids
            from transformers import CLIPTokenizer

            self._hf = CLIPTokenizer.from_pretrained(local_path)
        self._fallback = HashTokenizer(max_length)

    @property
    def is_real(self) -> bool:
        return self._hf is not None

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        if self._hf is not None:
            out = self._hf(
                texts, padding=True, truncation=True,
                max_length=self.max_length, return_tensors="np",
            )
            return (
                out["input_ids"].astype(np.int32),
                out["attention_mask"].astype(np.int32),
            )
        return self._fallback(texts)
