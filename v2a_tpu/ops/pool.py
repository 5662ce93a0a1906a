"""Argmax-packed max pooling for the ResNet18 trunk (3x3, stride 2, pad 1).

TPU re-design of the maxpool whose backward XLA lowers to
`select-and-scatter` — 0.56 ms/step of the policy train step at batch 64
(PERF.md round-3 train-step trace), an op with no MXU work at all. Here
the forward packs the bf16 activation bits and the (negated) flat spatial
index into ONE int32 key,

    key = sortable_bf16(x) << bits | (H*W - 1 - flat_idx),

so a single `reduce_window` max yields both the pooled value (exact — the
bf16 bits round-trip) and the argmax of every window, with ties resolved
to the FIRST maximum in row-major window order — the same tie rule as
XLA's select-and-scatter and torch's MaxPool2d backward
(`vision_nets.py:9-63` uses torchvision resnet18's maxpool).

The backward is a gather: with stride 2 / window 3 each input row sits in
at most two pooled rows ((i-1)/2 <= wi <= (i+1)/2), so the gradient is a
4-term masked gather of (dy, argmax) at static indices — pure elementwise
HBM traffic instead of select-and-scatter's windowed scan.

Only bf16 (16-bit) inputs pack into int32 alongside up-to-15 index bits;
callers fall back to `flax.linen.max_pool` for other dtypes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _sortable_u16(x: jax.Array) -> jax.Array:
    """Monotone bf16 -> [0, 0xFFFF] int32 map (IEEE total order, -0 < +0)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.int32)
    return jnp.where(u >= 0x8000, 0xFFFF - u, u | 0x8000)


def _unsortable_u16(key: jax.Array) -> jax.Array:
    u = jnp.where(key >= 0x8000, key & 0x7FFF, 0xFFFF - key)
    return jax.lax.bitcast_convert_type(u.astype(jnp.uint16), jnp.bfloat16)


def _fwd_keys(x: jax.Array, bits: int) -> jax.Array:
    b, h, w, c = x.shape
    flat = (jnp.arange(h)[:, None] * w + jnp.arange(w)[None, :]).astype(
        jnp.int32
    )
    rev = (h * w - 1) - flat  # max key <=> min flat idx (first in row-major)
    key = (_sortable_u16(x) << bits) | rev[None, :, :, None]
    return jax.lax.reduce_window(
        key,
        jnp.int32(-(2**31) + 1),
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def max_pool_3x3s2(x: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 max pool, NHWC bf16, H*W <= 2^15."""
    return _unsortable_u16(_fwd_keys(x, _idx_bits(x)) >> _idx_bits(x))


def _idx_bits(x: jax.Array) -> int:
    hw = x.shape[1] * x.shape[2]
    bits = int(hw - 1).bit_length()
    if x.dtype != jnp.bfloat16 or bits > 15:
        raise ValueError(f"max_pool_3x3s2 needs bf16 and H*W<=2^15, got {x.shape} {x.dtype}")
    return bits


def _mp_fwd(x):
    bits = _idx_bits(x)
    key = _fwd_keys(x, bits)
    return _unsortable_u16(key >> bits), (key, x.shape, bits)


def _repeat2(x, axis):
    """x -> each element doubled along `axis` (concat form, TPU-friendly)."""
    return jnp.stack([x, x], axis=axis + 1).reshape(
        x.shape[: axis] + (2 * x.shape[axis],) + x.shape[axis + 1 :]
    )


def _mp_bwd(res, dy):
    """Gather-form backward with NO gather ops: candidate pooled rows for
    input row i are (i±1)//2, i.e. a 2x nearest upsample of the pooled grid
    shifted by ±1 — pad/slice/parity-select only (TPU gathers on index
    arrays are catastrophically slow; the first version using jnp.take
    measured 26.6 vs 76.7 steps/s on-chip)."""
    key, x_shape, bits = res
    _, h, w, _ = x_shape
    argmax = (h * w - 1) - (key & ((1 << bits) - 1))  # (B,Ho,Wo,C) flat idx

    # 2x upsample: U[p, q] = v[p//2, q//2] on the input grid (h, w);
    # pooled grids are ceil(h/2) so 2*Ho >= h — trim to h, w.
    def up(v):
        u = _repeat2(_repeat2(v, 1), 2)[:, :h, :, :][:, :, :w, :]
        return jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))

    u_dy = up(dy.astype(jnp.float32))
    u_am = up(argmax + 1) - 1  # pad rows decode to argmax == -1 (no match)

    i = jnp.arange(h)
    j = jnp.arange(w)
    odd_i = (i % 2 == 1)[None, :, None, None]
    odd_j = (j % 2 == 1)[None, None, :, None]
    flat = (i[:, None] * w + j[None, :]).astype(jnp.int32)[None, :, :, None]

    dx = jnp.zeros(x_shape, jnp.float32)
    # (row shift, col shift, parity mask): +1 = the (i+1)//2 candidate
    # (valid for every parity), -1 = the (i-1)//2 candidate (odd rows only)
    for si, mi in ((1, None), (-1, odd_i)):
        for sj, mj in ((1, None), (-1, odd_j)):
            g = u_dy[:, 1 + si : 1 + si + h, 1 + sj : 1 + sj + w, :]
            a = u_am[:, 1 + si : 1 + si + h, 1 + sj : 1 + sj + w, :]
            hit = a == flat
            if mi is not None:
                hit = hit & mi
            if mj is not None:
                hit = hit & mj
            dx = dx + jnp.where(hit, g, 0.0)
    return (dx.astype(jnp.bfloat16),)


max_pool_3x3s2.defvjp(_mp_fwd, _mp_bwd)


# -- mask-backward variant (V2A_POOL_MASK_BWD) -------------------------------
#
# Round-4 experiment at VERDICT's suggestion: keep the bf16 `reduce_window`
# FORWARD (the hardware pooling path the int32-packed forward above misses)
# and replace only the backward — select-and-scatter costs 2 x 0.28 ms/step
# at batch 64 — with an elementwise candidate-compare against the pooled
# values saved from the forward.
#
# DELIBERATE SEMANTICS DEVIATION: a window's gradient flows to EVERY input
# position equal to the window max, not only the FIRST one (XLA's
# select-and-scatter / torch tie rule). Post-ReLU feature maps tie at 0.0
# often, so tied routing is a real (if tiny) gradient difference — this
# variant therefore ships OFF and is gated by V2A_POOL_MASK_BWD=1.


def _pool3x3s2_value(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype in (jnp.float32,) else jnp.asarray(
            -jnp.inf, x.dtype
        ),
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def max_pool_3x3s2_maskbwd(x: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 max pool, NHWC; all-ties backward (see above)."""
    return _pool3x3s2_value(x)


def _mb_fwd(x):
    pooled = _pool3x3s2_value(x)
    return pooled, (x, pooled)


def _mb_bwd(res, dy):
    x, pooled = res
    b, h, w, c = x.shape

    def up(v, fill):
        u = _repeat2(_repeat2(v, 1), 2)[:, :h, :, :][:, :, :w, :]
        return jnp.pad(
            u, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=fill
        )

    u_dy = up(dy.astype(jnp.float32), 0.0)
    # pad windows hold -inf: a real activation can never equal them, so the
    # out-of-range candidates contribute exactly 0
    u_p = up(pooled.astype(jnp.float32), -np.inf)

    i = jnp.arange(h)
    j = jnp.arange(w)
    odd_i = (i % 2 == 1)[None, :, None, None]
    odd_j = (j % 2 == 1)[None, None, :, None]
    xf = x.astype(jnp.float32)

    dx = jnp.zeros(x.shape, jnp.float32)
    for si, mi in ((1, None), (-1, odd_i)):
        for sj, mj in ((1, None), (-1, odd_j)):
            g = u_dy[:, 1 + si : 1 + si + h, 1 + sj : 1 + sj + w, :]
            p = u_p[:, 1 + si : 1 + si + h, 1 + sj : 1 + sj + w, :]
            hit = xf == p
            if mi is not None:
                hit = hit & mi
            if mj is not None:
                hit = hit & mj
            dx = dx + jnp.where(hit, g, 0.0)
    return (dx.astype(x.dtype),)


max_pool_3x3s2_maskbwd.defvjp(_mb_fwd, _mb_bwd)
