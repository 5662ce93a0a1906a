"""Pallas TPU kernels for the hot elementwise/normalization ops.

The video U-Net runs ~50 GroupNorm(32)+SiLU pairs per forward over
activations up to (B, F, 128, 128, 128); the reference computes GroupNorm in
float32 under fp16 autocast (`guided_diffusion/nn.py:26-28`). The fused
kernel here keeps the data in bf16 in HBM, computes group statistics in
float32 on-chip, and emits normalize+affine+SiLU in ONE read + ONE write per
chunk after a single stats read — the fp32 upcast never exists in HBM.

Layout contract: x is (B, S, C) channels-last with C a multiple of the
group count and of 128 (the TPU lane width); group statistics span (S, C/G)
per batch element, exactly torch GroupNorm semantics on a channels-last
flattening.

`fused_group_norm_silu(..., interpret=True)` runs the same kernels through
the Pallas interpreter for CPU tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrix(c: int, groups: int, g_pad: int) -> jax.Array:
    """(C, G_pad) one-hot channel->group assignment, built from iota so it
    lives in registers — Mosaic rejects reshapes onto narrow trailing dims,
    so group reductions become matmuls instead of reshape-sums."""
    gw = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g_pad), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g_pad), 1)
    return (ch // gw == gr).astype(jnp.float32)


def _stats_kernel(x_ref, sums_ref, *, groups: int, chunk: int):
    """Accumulate per-(batch, group) sum and sum-of-squares over S chunks.

    grid = (B, n_chunks); x block (1, chunk, C); sums block (1, 2, G_pad)
    revisited by every chunk of the same batch row (TPU grids run
    sequentially, so accumulation across grid steps is safe).
    """
    j = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)  # (chunk, C)
    s, c = x.shape
    g_pad = sums_ref.shape[-1]
    m = _group_matrix(c, groups, g_pad)  # (C, G_pad)
    col_sum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    col_sq = jnp.sum(x * x, axis=0, keepdims=True)
    row = jnp.concatenate(
        [
            jnp.dot(col_sum, m, preferred_element_type=jnp.float32),
            jnp.dot(col_sq, m, preferred_element_type=jnp.float32),
        ],
        axis=0,
    )  # (2, G_pad)

    @pl.when(j == 0)
    def _():
        sums_ref[0] = row

    @pl.when(j > 0)
    def _():
        sums_ref[0] = sums_ref[0] + row


def _apply_kernel(
    x_ref, sums_ref, scale_ref, bias_ref, o_ref,
    *, groups: int, n_per_group: float, eps: float, with_silu: bool,
):
    """Normalize + affine (+ SiLU) one (1, chunk, C) block."""
    x = x_ref[0].astype(jnp.float32)  # (chunk, C)
    s, c = x.shape
    g_pad = sums_ref.shape[-1]
    m = _group_matrix(c, groups, g_pad)  # (C, G_pad)
    stats = sums_ref[0]  # (2, G_pad): [sums; sumsqs]
    mean_g = stats[0:1] / n_per_group  # (1, G_pad)
    var_g = stats[1:2] / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # scatter group stats back to channels with the transpose matmul
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(rstd_g, m.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c
    y = y * scale_ref[0][None, :].astype(jnp.float32) + bias_ref[0][
        None, :
    ].astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_chunk(s: int, c: int, budget_bytes: int = 2 * 1024 * 1024) -> int:
    """Largest divisor chunk of S whose (chunk, C) f32 block fits budget."""
    max_rows = max(budget_bytes // (c * 4), 8)
    best = 1
    for d in range(1, s + 1):
        if s % d == 0 and d <= max_rows:
            best = d
    return best


@functools.partial(
    jax.jit,
    static_argnames=("groups", "eps", "with_silu", "interpret", "chunk"),
)
def fused_group_norm_silu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = True,
    interpret: bool = False,
    chunk: Optional[int] = None,
) -> jax.Array:
    """GroupNorm(+SiLU) over (..., S, C) channels-last with fp32 statistics.

    Accepts any rank >= 2; leading dims other than the first are folded into
    S. For (B, F, H, W, C) pass as-is: stats span (F*H*W, C/G) per batch
    element, matching torch GroupNorm on the video tensors.
    """
    orig_shape = x.shape
    b = orig_shape[0]
    c = orig_shape[-1]
    s = 1
    for d in orig_shape[1:-1]:
        s *= d
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    x3 = x.reshape(b, s, c)

    chunk = chunk or _pick_chunk(s, c)
    if chunk > s or s % chunk:
        raise ValueError(
            f"chunk {chunk} must divide the folded spatial size {s}"
        )
    n_chunks = s // chunk
    g_pad = max(128, groups)

    sums = pl.pallas_call(
        functools.partial(_stats_kernel, groups=groups, chunk=chunk),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, g_pad), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, g_pad), jnp.float32),
        interpret=interpret,
    )(x3)

    out = pl.pallas_call(
        functools.partial(
            _apply_kernel,
            groups=groups,
            n_per_group=float(s * (c // groups)),
            eps=eps,
            with_silu=with_silu,
        ),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 2, g_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(x3, sums, scale.reshape(1, c), bias.reshape(1, c))

    return out.reshape(orig_shape)


def group_norm_silu_reference(
    x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int = 32,
    eps: float = 1e-5, with_silu: bool = True,
) -> jax.Array:
    """Plain-XLA reference implementation (fp32 stats, same semantics)."""
    orig_shape = x.shape
    b, c = orig_shape[0], orig_shape[-1]
    xf = x.reshape(b, -1, groups, c // groups).astype(jnp.float32)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, -1, c) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(orig_shape).astype(x.dtype)
