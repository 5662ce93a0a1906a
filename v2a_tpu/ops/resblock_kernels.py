"""Pallas TPU kernels for the video U-Net ResBlock interior.

The reference ResBlock (`.../guided_diffusion/unet.py:148-261`) chains
GroupNorm -> SiLU -> conv -> temporal conv -> emb-add -> GroupNorm -> SiLU ->
conv -> temporal conv -> residual-add. On TPU the spatial 3x3 convs run at
the MXU's speed of light under XLA (PERF.md cost model), but round 1 measured
~140 ms of the 188 ms forward in the glue BETWEEN convs — dominated by the
temporal conv's transpose->conv1d->transpose round trips and GroupNorm's
extra statistics passes.

This module removes those passes:

- `temporal_conv_fused`: the 3-tap temporal conv (full CxC channel mixing per
  tap, `.../guided_diffusion/nn.py:30-88`) computed directly on the
  (B, F, S, C) layout. Each grid block holds all F frames, so the F-axis
  halo is free and the op is ONE read + ONE write instead of the six
  transpose/gemm passes XLA emits for the transpose formulation. The
  timestep-embedding add (`unet.py:232`), the residual add (`unet.py:261`),
  and the conv bias all fuse into the same write.
- a per-(B, F, C) sum/sumsq side output ("stats") accumulated from the
  values actually written (post bf16 rounding), which downstream GroupNorms
  consume to skip their own full-tensor statistics read — see
  `GroupNorm32`'s `stats` argument. Per-frame granularity makes the same
  stats tensor usable both by ResBlock norms (aggregate over F) and by the
  per-frame attention norms (`unet.py:304-309`).

Layout contract: x is (B, F, S, C) with C a multiple of 128; S a power of
two (the U-Net's folded H*W). Weights use the flax Conv temporal layout
(k, C_in, C_out) reshaped to (k*C_in, C_out) by the caller-facing wrapper.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# S-tile VMEM budget for the temporal-conv kernel blocks (bytes); the
# shifted copies / fp32 accumulator / residual / double-buffering multiply
# the block size ~14x, so budgets >=2 MB OOM the 16 MB scoped vmem
TCONV_TILE_BUDGET = int(
    os.environ.get("V2A_TCONV_TILE_BUDGET", str(1024 * 1024))
)
# Compute the in-kernel SiLU in bf16 instead of f32: halves the VPU
# transcendental traffic in the conv kernels' affine+SiLU prologue (the
# affine itself stays f32 for GroupNorm precision). Numerics: the values
# feed bf16 matmuls either way; bf16 sigmoid costs ~1e-3 relative error.
BF16_SILU = os.environ.get("V2A_BF16_SILU", "0") == "1"


def _silu(xf, out_dtype):
    if BF16_SILU and out_dtype == jnp.bfloat16:
        # explicit bf16 constants: jax.nn.sigmoid's f32 literal hits a
        # Mosaic vector.broadcast element-type verification bug in bf16
        xb = xf.astype(jnp.bfloat16)
        one = jnp.asarray(1.0, jnp.bfloat16)
        sig = one / (one + jnp.exp(-xb))
        return (xb * sig).astype(jnp.float32)
    return xf * jax.nn.sigmoid(xf)


def _pick_tile(s: int, c: int, budget_bytes: int = 0) -> int:
    """Largest 8-aligned divisor tile of S whose (F, tile, C) bf16 block
    stays within budget. S is a power of two at every U-Net level in the
    plain layout; the padded-stream layout folds S' = Hp*Wp (e.g. 130*136),
    so general divisors are searched. The budget covers the block itself;
    the shifted copies, fp32 accumulator, residual and double-buffered IO
    multiply it ~14x — 2 MB budgets OOM the 16 MB scoped vmem in
    production (measured)."""
    budget_bytes = budget_bytes or TCONV_TILE_BUDGET
    max_rows = max(budget_bytes // (c * 2 * 7), 8)
    best = 0
    d = 1
    while d * d <= s:
        if s % d == 0:
            for t in (d, s // d):
                if t <= max_rows and t % 8 == 0 and t > best:
                    best = t
        d += 1
    if best:
        return best
    # tiny/odd S: fall back to the largest divisor <= max_rows
    for t in range(min(s, max_rows), 0, -1):
        if s % t == 0:
            return t
    return 1


def _tconv_kernel(
    *refs,
    frames: int,
    has_emb: bool,
    has_res: bool,
    want_stats: bool,
):
    """One (1, F, tile, C) block: per-frame 3-tap temporal conv as a single
    (tile, 3C) x (3C, C) matmul, fused adds, optional stats accumulation."""
    idx = 0
    x_ref = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1
    b_ref = refs[idx]; idx += 1
    emb_ref = None
    res_ref = None
    if has_emb:
        emb_ref = refs[idx]; idx += 1
    if has_res:
        res_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    stats_ref = refs[idx] if want_stats else None

    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[0]  # (F, tile, C)
    w = w_ref[:]  # (3C, C)
    c = x.shape[-1]
    tile = x.shape[1]
    bias = b_ref[0].astype(jnp.float32)  # (C,) as (1, C) row
    if has_emb:
        # emb rides in as the full (B, C) array (a (1, C) block would break
        # Mosaic's sublane tiling rule, and a dynamic sublane index must be
        # 8-aligned) — select this batch row with a one-hot mask + reduce
        e = emb_ref[:].astype(jnp.float32)  # (B, C)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, e.shape, 0) == i
        ).astype(jnp.float32)
        bias = bias + jnp.sum(e * sel, axis=0)

    # whole-block per-tap dots: three (F*tile, C) x (C, C) gemms over the
    # frame-shifted views — M spans all frames (vs the old per-frame
    # concats), and no (F*tile, 3C) cat buffer (which OOMs the 16 MB
    # scoped vmem at L1 once the residual/stats ride along). Measured
    # fastest production-viable form at L0/L1 (PERF.md round 2b).
    zrow = jnp.zeros((1, tile, c), x.dtype)
    xm1 = jnp.concatenate([zrow, x[:-1]], axis=0).reshape(frames * tile, c)
    xp1 = jnp.concatenate([x[1:], zrow], axis=0).reshape(frames * tile, c)
    x2 = x.reshape(frames * tile, c)
    w0, w1, w2 = w[:c], w[c:2 * c], w[2 * c:]

    def tap(xs, wt):
        return jax.lax.dot_general(
            xs, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    y = tap(x2, w1) + tap(xm1, w0) + tap(xp1, w2)
    y = y + bias[None, :]
    y = y.reshape(frames, tile, c)
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    y16 = y.astype(o_ref.dtype)
    o_ref[0] = y16
    if want_stats:
        yf = y16.astype(jnp.float32)
        row = jnp.stack(
            [jnp.sum(yf, axis=1), jnp.sum(yf * yf, axis=1)], axis=1
        )  # (F, 2, C)

        @pl.when(j == 0)
        def _():
            stats_ref[0] = row

        @pl.when(j > 0)
        def _():
            stats_ref[0] = stats_ref[0] + row


@functools.partial(
    jax.jit,
    static_argnames=("want_stats", "interpret", "tile"),
)
def temporal_conv_fused(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    emb: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    want_stats: bool = False,
    interpret: bool = False,
    tile: Optional[int] = None,
):
    """y = temporal_conv(x) + bias [+ emb] [+ residual], optionally with the
    per-(B, F, C) sum/sumsq statistics of y as a second output.

    Args:
      x: (B, F, H, W, C) or (B, F, S, C) activations.
      kernel: (k, C_in, C_out) flax temporal-conv kernel, k odd (3), C_in ==
        C_out == C.
      bias: (C,).
      emb: optional (B, C) per-sample channel offsets (the timestep/task
        embedding projection), added after the conv.
      residual: optional array broadcastable to x's shape, added last.
    Returns:
      y with x's shape [, stats (B, F, 2, C) float32].
    """
    orig_shape = x.shape
    b, f = orig_shape[0], orig_shape[1]
    c = orig_shape[-1]
    s = 1
    for d in orig_shape[2:-1]:
        s *= d
    k = kernel.shape[0]
    if kernel.shape[1] != c or kernel.shape[2] != c:
        raise ValueError(f"temporal conv must be CxC, got {kernel.shape}")
    if k != 3:
        raise NotImplementedError("3-tap temporal convs only")

    x4 = x.reshape(b, f, s, c)
    tile = tile or _pick_tile(s, c)
    if s % tile:
        raise ValueError(f"tile {tile} must divide folded spatial size {s}")
    n_tiles = s // tile

    w2d = kernel.reshape(k * c, c).astype(x.dtype)
    in_specs = [
        pl.BlockSpec((1, f, tile, c), lambda i, j: (i, 0, j, 0)),
        pl.BlockSpec((k * c, c), lambda i, j: (0, 0)),
        pl.BlockSpec((1, c), lambda i, j: (0, 0)),
    ]
    args = [x4, w2d, bias.reshape(1, c)]
    if emb is not None:
        in_specs.append(pl.BlockSpec((b, c), lambda i, j: (0, 0)))
        args.append(emb.reshape(b, c))
    if residual is not None:
        residual = jnp.broadcast_to(residual, orig_shape).astype(x.dtype)
        in_specs.append(pl.BlockSpec((1, f, tile, c), lambda i, j: (i, 0, j, 0)))
        args.append(residual.reshape(b, f, s, c))

    out_shapes = [jax.ShapeDtypeStruct((b, f, s, c), x.dtype)]
    out_specs = [pl.BlockSpec((1, f, tile, c), lambda i, j: (i, 0, j, 0))]
    if want_stats:
        out_shapes.append(jax.ShapeDtypeStruct((b, f, 2, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, f, 2, c), lambda i, j: (i, 0, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(
            _tconv_kernel,
            frames=f,
            has_emb=emb is not None,
            has_res=residual is not None,
            want_stats=want_stats,
        ),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shapes if want_stats else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "arbitrary" if want_stats else "parallel"
            )
        ),
        interpret=interpret,
    )(*args)

    if want_stats:
        y, stats = outs
        return y.reshape(orig_shape), stats
    return outs.reshape(orig_shape)


def _tconv_hw_kernel(
    *refs,
    frames: int,
    has_emb: bool,
    has_res: bool,
    want_stats: bool,
):
    """HW-major layout: one (tile_hw, B, F, C) block per grid step. The
    logical (H*W, B, F, C) view is byte-identical to the (B*F, H, W, C)
    tensor in XLA's preferred convolution layout {3,0,2,1}, so the
    transposes at the kernel boundary compile to bitcasts — no relayout
    fusions (PERF.md round 2 trace)."""
    idx = 0
    x_ref = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1
    b_ref = refs[idx]; idx += 1
    emb_ref = None
    res_ref = None
    if has_emb:
        emb_ref = refs[idx]; idx += 1
    if has_res:
        res_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    stats_ref = refs[idx] if want_stats else None

    j = pl.program_id(0)
    x = x_ref[:]  # (tile, B, F, C)
    tile, b, f, c = x.shape
    w = w_ref[:]  # (3C, C)
    # per-tap dots: Mosaic cannot concat F-sliced vectors whose sublane
    # offsets differ, and the 3-dot form measured equal to the concat form
    w0, w1, w2 = w[:c], w[c:2 * c], w[2 * c:]
    bias = b_ref[0].astype(jnp.float32)  # (C,)
    emb = emb_ref[:].astype(jnp.float32) if has_emb else None  # (B, C)

    def tap(xs, wt):
        return jax.lax.dot_general(
            xs.reshape(tile * b, c), wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for fi in range(frames):
        y = tap(x[:, :, fi], w1)
        if fi > 0:
            y = y + tap(x[:, :, fi - 1], w0)
        if fi < frames - 1:
            y = y + tap(x[:, :, fi + 1], w2)
        y = y.reshape(tile, b, c)
        y = y + bias[None, None, :]
        if has_emb:
            y = y + emb[None, :, :]
        if has_res:
            y = y + res_ref[:, :, fi].astype(jnp.float32)
        y16 = y.astype(o_ref.dtype)
        o_ref[:, :, fi] = y16
        if want_stats:
            yf = y16.astype(jnp.float32)
            row = jnp.stack(
                [jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)], axis=1
            )  # (B, 2, C)

            @pl.when(j == 0)
            def _():
                stats_ref[:, fi] = row

            @pl.when(j > 0)
            def _():
                stats_ref[:, fi] = stats_ref[:, fi] + row


@functools.partial(
    jax.jit,
    static_argnames=("want_stats", "interpret", "tile"),
)
def temporal_conv_fused_hw(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    emb: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    want_stats: bool = False,
    interpret: bool = False,
    tile: Optional[int] = None,
):
    """Same contract as `temporal_conv_fused` but the kernel runs on the
    (H*W, B, F, C) view so the boundary transposes are layout bitcasts.
    x: (B, F, H, W, C) logical; returns the same [, stats (B, F, 2, C)]."""
    b, f = x.shape[0], x.shape[1]
    c = x.shape[-1]
    orig_shape = x.shape
    s = 1
    for d in x.shape[2:-1]:
        s *= d
    k = kernel.shape[0]
    if k != 3 or kernel.shape[1] != c or kernel.shape[2] != c:
        raise NotImplementedError(kernel.shape)

    # (B, F, S, C) -> (S, B, F, C): byte-identical to the conv layout
    xh = x.reshape(b, f, s, c).transpose(2, 0, 1, 3)
    if tile is None:
        budget_rows = max((512 * 1024) // (b * f * c * 2), 8)
        tile = 1
        while tile * 2 <= s and tile * 2 <= budget_rows:
            tile *= 2
    if s % tile:
        raise ValueError(f"tile {tile} must divide {s}")
    n_tiles = s // tile

    w2d = kernel.reshape(k * c, c).astype(x.dtype)
    in_specs = [
        pl.BlockSpec((tile, b, f, c), lambda j: (j, 0, 0, 0)),
        pl.BlockSpec((k * c, c), lambda j: (0, 0)),
        pl.BlockSpec((1, c), lambda j: (0, 0)),
    ]
    args = [xh, w2d, bias.reshape(1, c)]
    if emb is not None:
        in_specs.append(pl.BlockSpec((b, c), lambda j: (0, 0)))
        args.append(emb.reshape(b, c))
    if residual is not None:
        residual = jnp.broadcast_to(residual, orig_shape).astype(x.dtype)
        rh = residual.reshape(b, f, s, c).transpose(2, 0, 1, 3)
        in_specs.append(pl.BlockSpec((tile, b, f, c), lambda j: (j, 0, 0, 0)))
        args.append(rh)

    out_shapes = [jax.ShapeDtypeStruct((s, b, f, c), x.dtype)]
    out_specs = [pl.BlockSpec((tile, b, f, c), lambda j: (j, 0, 0, 0))]
    if want_stats:
        out_shapes.append(jax.ShapeDtypeStruct((b, f, 2, c), jnp.float32))
        out_specs.append(pl.BlockSpec((b, f, 2, c), lambda j: (0, 0, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(
            _tconv_hw_kernel,
            frames=f,
            has_emb=emb is not None,
            has_res=residual is not None,
            want_stats=want_stats,
        ),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shapes if want_stats else out_shapes[0],
        interpret=interpret,
    )(*args)

    y = outs[0] if want_stats else outs
    y = y.transpose(1, 2, 0, 3).reshape(orig_shape)
    if want_stats:
        return y, outs[1]
    return y


def temporal_conv_reference(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    emb: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain-XLA reference: zero-padded 3-tap conv over the frame axis with
    full channel mixing (flax Conv semantics on (B*S, F, C))."""
    b, f = x.shape[0], x.shape[1]
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    k = kernel.shape[0]
    pad = k // 2
    xp = jnp.pad(xf, [(0, 0), (pad, pad)] + [(0, 0)] * (x.ndim - 2))
    y = jnp.zeros_like(xf)
    for t in range(k):
        y = y + jnp.einsum(
            "b f ... c, c d -> b f ... d",
            jax.lax.slice_in_dim(xp, t, t + f, axis=1),
            kernel[t].astype(jnp.float32),
        )
    y = y + bias.astype(jnp.float32)
    if emb is not None:
        e = emb.reshape(b, *([1] * (x.ndim - 2)), c)
        y = y + e.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def stats_to_group_affine(
    stats: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    n_per_channel: int,
    groups: int = 32,
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Fold GroupNorm statistics + affine params into per-(B, C) scale/shift.

    Given per-(B, C) sum/sumsq stats of a tensor h (shape (B, 2, C),
    already aggregated over all non-batch non-channel axes), GroupNorm over
    (S, C/G) per sample followed by the affine collapses to `y = h * A + B`
    with A, B per (batch, channel) — a pure elementwise map that XLA fuses
    into the consumer. `n_per_channel` is the number of elements summed per
    channel entry.
    """
    c = stats.shape[-1]
    gw = c // groups
    sums = stats[:, 0, :]  # (B, C)
    sumsqs = stats[:, 1, :]
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch // gw == gr).astype(jnp.float32)  # (C, G)
    n = float(n_per_channel * gw)
    sum_g = sums @ m
    sumsq_g = sumsqs @ m
    mean_g = sum_g / n
    var_g = jnp.maximum(sumsq_g / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ m.T  # (B, C)
    rstd_c = rstd_g @ m.T
    a = rstd_c * scale.astype(jnp.float32)[None, :]
    bshift = bias.astype(jnp.float32)[None, :] - mean_c * a
    return a, bshift


# -- fused affine+SiLU 3x3 conv (deep levels) --------------------------------


def _affine_conv_kernel(
    *refs, g, h_out, w_out, hp, wp, cin, cout, has_affine, silu,
):
    """One (g frames, Hp, Wp, Cin) block: optional per-frame channel affine
    (the GroupNorm collapse) + SiLU, then the 3x3 SAME conv as ONE
    (g*H*W, 9*Cin) x (9*Cin, Cout) matmul built from an in-VMEM im2col —
    M = g*H*W keeps the MXU full even at the 8x8/16x16 levels where XLA's
    conv emitter runs at 29/61 TFLOP/s (PERF.md cost model)."""
    idx = 0
    x_ref = refs[idx]; idx += 1
    a_ref = b_ref = None
    if has_affine:
        a_ref = refs[idx]; idx += 1  # (N, Cin) float32, full
        b_ref = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1      # (9*Cin, Cout)
    bias_ref = refs[idx]; idx += 1   # (1, Cout)
    o_ref = refs[idx]; idx += 1      # (g, H, W, Cout)
    im_ref = refs[idx]               # scratch (g*H*W, 9*Cin)

    i = pl.program_id(0)
    x = x_ref[:]  # (g, Hp, Wp, Cin)
    if has_affine:
        n_rows = a_ref.shape[0]
        # rows i*g..i*g+g-1 of the (N, Cin) affine, selected by one-hot
        # matmul (dynamic sublane indices must be 8-aligned on Mosaic)
        row = jax.lax.broadcasted_iota(jnp.int32, (g, n_rows), 1)
        want = i * g + jax.lax.broadcasted_iota(jnp.int32, (g, n_rows), 0)
        sel = (row == want).astype(jnp.float32)
        a = jax.lax.dot_general(
            sel, a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (g, Cin)
        bsh = jax.lax.dot_general(
            sel, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xf = x.astype(jnp.float32) * a[:, None, None, :] + bsh[:, None, None, :]
        if silu:
            xf = _silu(xf, o_ref.dtype)
        # the affine turns the zero padding into silu(b) != 0 — re-zero it
        rr = jax.lax.broadcasted_iota(jnp.int32, (1, hp, wp, 1), 1)
        cc = jax.lax.broadcasted_iota(jnp.int32, (1, hp, wp, 1), 2)
        interior = (
            (rr >= 1) & (rr <= h_out) & (cc >= 1) & (cc <= w_out)
        ).astype(jnp.float32)
        x = (xf * interior).astype(x_ref.dtype)

    hw = h_out * w_out
    for f in range(g):
        hf = x[f]  # (Hp, Wp, Cin)
        for dj in range(3):
            sh = hf[:, dj:dj + w_out, :]  # (Hp, W, Cin)
            for di in range(3):
                t = di * 3 + dj
                im_ref[f * hw:(f + 1) * hw, t * cin:(t + 1) * cin] = (
                    sh[di:di + h_out].reshape(hw, cin)
                )
    y = jax.lax.dot_general(
        im_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + bias_ref[0].astype(jnp.float32)[None, :]
    o_ref[:] = y.reshape(g, h_out, w_out, cout).astype(o_ref.dtype)


def _affine_conv_banded_kernel(
    *refs, th, h_out, w_out, cin, cout, has_affine, silu,
):
    """One (1, th+2, Wp, Cin) halo'd row band (Element-indexed overlapping
    blocks over the row-padded input): optional per-(N, C) affine + SiLU,
    then 9 per-tap (th*W, Cin) x (Cin, Cout) dots accumulated in fp32.
    Serves the large levels (L0/L1: 128^2/64^2) where a whole frame exceeds
    VMEM; per-tap dots keep VPU traffic at 3 column-shift materializations
    per band (row slices are free outer-dim views)."""
    idx = 0
    x_ref = refs[idx]; idx += 1
    a_ref = b_ref = None
    if has_affine:
        a_ref = refs[idx]; idx += 1  # (N, Cin) float32, full
        b_ref = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1      # (9*Cin, Cout)
    bias_ref = refs[idx]; idx += 1   # (1, Cout)
    o_ref = refs[idx]                # (1, th, W, Cout)

    n = pl.program_id(0)
    i = pl.program_id(1)
    x = x_ref[0]  # (th+2, Wp, Cin)
    hp_rows = x.shape[0]
    wp = x.shape[1]
    xf = x.astype(jnp.float32)
    if has_affine:
        n_rows = a_ref.shape[0]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1) == n
        ).astype(jnp.float32)
        a = jax.lax.dot_general(
            sel, a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Cin)
        bsh = jax.lax.dot_general(
            sel, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xf = xf * a[0][None, None, :] + bsh[0][None, None, :]
        if silu:
            xf = _silu(xf, o_ref.dtype)
        # zero the padding back out: global padded row in [1, H], col in [1, W]
        rr = (
            jax.lax.broadcasted_iota(jnp.int32, (hp_rows, wp, 1), 0)
            + i * th
        )
        cc = jax.lax.broadcasted_iota(jnp.int32, (hp_rows, wp, 1), 1)
        keep = (
            (rr >= 1) & (rr <= h_out) & (cc >= 1) & (cc <= w_out)
        )
        xf = jnp.where(keep, xf, 0.0)
    xb = xf.astype(x_ref.dtype)

    acc = None
    for dj in range(3):
        sh = xb[:, dj:dj + w_out, :]  # (th+2, W, Cin) — one shift copy
        for di in range(3):
            t = di * 3 + dj
            xs = sh[di:di + th].reshape(th * w_out, cin)
            part = jax.lax.dot_general(
                xs, w_ref[t * cin:(t + 1) * cin],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    y = acc + bias_ref[0].astype(jnp.float32)[None, :]
    o_ref[0] = y.reshape(th, w_out, cout).astype(o_ref.dtype)


def spatial2_band_rows(h: int, w: int, c: int, d: int,
                       budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Rows per band: power-of-two divisor of h with the band + 3 shifts +
    fp32 accumulator within budget."""
    th = h
    def cost(t):
        return (t + 2) * (w + 10) * c * 2 * 4 + t * w * d * 4
    while th > 8 and cost(th) > budget_bytes:
        th //= 2
    while h % th:
        th //= 2
    return max(th, 1)


def spatial2_group(n: int, h: int, w: int, c: int,
                   budget_bytes: int = 15 * 1024 * 1024) -> int:
    """Frames per block: the largest divisor of n with M = g*h*w <= 1024
    and the working set — (9C, D~C) weights (7.4 MB alone at 640ch),
    im2col scratch, double-buffered IO — within budget."""
    weights = 9 * c * c * 2
    wp = (w + 9) // 8 * 8
    group = 1
    for cand in (2, 4, 7, 8, 14):
        if n % cand:
            continue
        if cand * h * w > 1024:
            break
        scratch = cand * h * w * 9 * c * 2
        io = 2 * cand * (h + 2) * wp * c * 2 * 2
        xf32 = cand * (h + 2) * wp * c * 4
        if weights + scratch + io + xf32 > budget_bytes:
            break
        group = cand
    return group


@functools.partial(
    jax.jit, static_argnames=("silu", "interpret", "group", "tile_h")
)
def fused_affine_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    a: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    silu: bool = False,
    group: Optional[int] = None,
    tile_h: Optional[int] = None,
    interpret: bool = False,
):
    """y = conv3x3_same(silu(a*x + b)), the ResBlock front half in one pass.

    Args:
      x: (N, H, W, C) raw (pre-norm) activations, N = B*F.
      kernel: (3, 3, C, D) flax conv kernel; bias: (D,).
      a, b: optional per-(N, C) float32 affine (the GroupNorm collapsed via
        `stats_to_group_affine`, broadcast per frame by the caller); `silu`
        applies SiLU after the affine (the GN->SiLU->conv ResBlock order,
        `.../guided_diffusion/unet.py:148-261`).
    Returns (N, H, W, D) in x.dtype.

    Dispatch: whole frames (grouped, one im2col matmul) when H*W <= 512;
    halo'd row bands (Element-indexed overlapping blocks, 9 per-tap dots)
    for the larger levels.
    """
    n, h, w, c = x.shape
    d = kernel.shape[-1]
    if kernel.shape[:3] != (3, 3, c):
        raise ValueError(f"kernel {kernel.shape} vs input C={c}")
    wp = ((w + 2 + 7) // 8) * 8
    hp = h + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    has_affine = a is not None
    # (3,3,C,D) -> (9C, D) with the tap order used by the kernels (di*3+dj)
    w2d = kernel.astype(x.dtype).reshape(9 * c, d)

    if h * w <= 512:
        g = group or spatial2_group(n, h, w, c)
        if n % g:
            raise ValueError(f"group {g} must divide N={n}")
        in_specs = [pl.BlockSpec((g, hp, wp, c), lambda i: (i, 0, 0, 0))]
        args = [xp]
        if has_affine:
            in_specs.append(pl.BlockSpec((n, c), lambda i: (0, 0)))
            in_specs.append(pl.BlockSpec((n, c), lambda i: (0, 0)))
            args += [a.astype(jnp.float32), b.astype(jnp.float32)]
        in_specs.append(pl.BlockSpec((9 * c, d), lambda i: (0, 0)))
        in_specs.append(pl.BlockSpec((1, d), lambda i: (0, 0)))
        args += [w2d, bias.reshape(1, d)]

        return pl.pallas_call(
            functools.partial(
                _affine_conv_kernel, g=g, h_out=h, w_out=w, hp=hp, wp=wp,
                cin=c, cout=d, has_affine=has_affine, silu=silu,
            ),
            grid=(n // g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((g, h, w, d), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, h, w, d), x.dtype),
            scratch_shapes=[pltpu.VMEM((g * h * w, 9 * c), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(*args)

    # banded path (large levels). Element block dims give overlapping
    # (halo'd) row blocks over the row-padded input with the standard
    # pipelining machinery — no manual DMA. (jax 0.9 exposes Element only
    # in jax._src.pallas.core; low padding is unsupported on Mosaic, hence
    # the HBM row pad.)
    from jax._src.pallas import core as _pc

    th = tile_h or spatial2_band_rows(h, w, c, d)
    if h % th:
        raise ValueError(f"tile_h {th} must divide H={h}")
    E = _pc.Element
    in_specs = [
        pl.BlockSpec(
            (E(1), E(th + 2), E(wp), E(c)),
            lambda nn, i: (nn, i * th, 0, 0),
        )
    ]
    args = [xp]
    if has_affine:
        in_specs.append(pl.BlockSpec((n, c), lambda nn, i: (0, 0)))
        in_specs.append(pl.BlockSpec((n, c), lambda nn, i: (0, 0)))
        args += [a.astype(jnp.float32), b.astype(jnp.float32)]
    in_specs.append(pl.BlockSpec((9 * c, d), lambda nn, i: (0, 0)))
    in_specs.append(pl.BlockSpec((1, d), lambda nn, i: (0, 0)))
    args += [w2d, bias.reshape(1, d)]

    return pl.pallas_call(
        functools.partial(
            _affine_conv_banded_kernel, th=th, h_out=h, w_out=w,
            cin=c, cout=d, has_affine=has_affine, silu=silu,
        ),
        grid=(n, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, d), lambda nn, i: (nn, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(*args)


# -- padded-stream fused affine+SiLU 3x3 conv --------------------------------
#
# The padded-stream formulation keeps activations in (N, Hp, Wp, C) form —
# interior at rows 1..H / cols 1..W, one halo row/col each side (Wp rounded
# up to the sublane multiple) — across a whole U-Net level, so the
# per-conv `jnp.pad` HBM pass (15.5 ms/fwd in the round-2 trace) never
# happens. The conv kernel reads the pre-padded stream directly, applies
# the collapsed-GroupNorm affine + SiLU + interior mask on the fly (pad
# VALUES are therefore irrelevant on input), and writes a padded output
# with zeroed borders (column placement happens in f32 before the bf16
# cast — Mosaic has no bf16 sublane rotate).


def padded_hw(h: int, w: int) -> Tuple[int, int]:
    """(Hp, Wp) of the padded-stream layout for an (H, W) interior."""
    return h + 2, ((w + 2 + 7) // 8) * 8


def padded_band_rows(h: int, wp: int, cins, d: int,
                     budget_bytes: int = 10 * 1024 * 1024) -> int:
    """Rows per output band: the largest divisor of the INTERIOR height H
    whose working set — the (9C, D) weight matrices (4.4 MB alone for the
    L2 split conv; omitting them made the picker borderline against the
    16 MB scoped vmem), double-buffered halo windows and output, the fp32
    accumulator and per-part temporaries — fits the budget. With tp | H
    the (tp+2)-row input window at padded-row start i*tp is always
    in-bounds (the padded array has H+2 rows) — no clamping, no
    realignment pass."""
    weights = sum(9 * c * d * 2 for c in cins)

    def cost(t):
        win = sum(2 * (t + 2) * wp * c * 2 for c in cins)
        out = 2 * t * wp * d * 2
        acc = t * wp * d * 4
        ftmp = (t + 2) * wp * max(cins) * 4
        return weights + win + out + acc + ftmp

    best = 1
    for t in range(1, h + 1):
        if h % t == 0 and cost(t) <= budget_bytes:
            best = max(best, t)
    return best


def _padded_conv_kernel(
    *refs, tp, h, w, wp, cins, d, silu,
):
    """One (sample, row-band) grid step of the padded-stream conv.

    Inputs per part: the (1, tp+2, Wp, C_i) halo window (Element-indexed
    at padded-row i*tp — always in-bounds for tp | H), the per-(N, C_i)
    collapsed-GroupNorm affine, and the (9*C_i, D) tap matrix. The output
    band (1, tp, Wp, D) lands on INTERIOR padded rows 1+i*tp.. via an
    Element out spec: interior cols conv'd, pad cols zeroed (placement in
    f32 — no bf16 sublane rotate on Mosaic), pad ROWS of the output buffer
    never written (garbage by contract: every padded-stream consumer
    masks or skips them)."""
    n_parts = len(cins)
    idx = 0
    x_refs = []
    a_refs = []
    b_refs = []
    w_refs = []
    for _ in range(n_parts):
        x_refs.append(refs[idx]); idx += 1
        a_refs.append(refs[idx]); idx += 1
        b_refs.append(refs[idx]); idx += 1
        w_refs.append(refs[idx]); idx += 1
    bias_ref = refs[idx]; idx += 1
    o_ref = refs[idx]

    nn_ = pl.program_id(0)
    i = pl.program_id(1)

    acc = None
    for pi in range(n_parts):
        c = cins[pi]
        x = x_refs[pi][0]  # (tp+2, Wp, C) raw padded-stream values
        n_rows = a_refs[pi].shape[0]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1) == nn_
        ).astype(jnp.float32)
        av = jax.lax.dot_general(
            sel, a_refs[pi][:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]  # (C,)
        bv = jax.lax.dot_general(
            sel, b_refs[pi][:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        xf = x.astype(jnp.float32) * av[None, None, :] + bv[None, None, :]
        if silu:
            xf = _silu(xf, o_ref.dtype)
        # interior mask in PADDED coordinates: global row g = i*tp + wrow
        # in [1, H], col in [1, W]; pad values (zeros, garbage rows, other
        # parts' leftovers) never survive this select
        rr = (
            jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 0) + i * tp
        )
        cc = jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 1)
        keep = (rr >= 1) & (rr <= h) & (cc >= 1) & (cc <= w)
        xb = jnp.where(keep, xf, 0.0).astype(x_refs[pi].dtype)

        # out padded row r = 1+i*tp+rl needs input padded rows r-1..r+1 =
        # window rows rl..rl+2 — taps are the same static slices as the
        # pre-padded banded kernel
        for dj in range(3):
            sh = xb[:, dj:dj + w, :]  # (tp+2, W, C)
            for di in range(3):
                t = di * 3 + dj
                xs = sh[di:di + tp].reshape(tp * w, c)
                part = jax.lax.dot_general(
                    xs, w_refs[pi][t * c:(t + 1) * c],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
    y = acc + bias_ref[0].astype(jnp.float32)[None, :]
    y = y.reshape(tp, w, d)
    # place at col offset 1 in f32 (bf16 sublane rotates are unsupported)
    yp = jnp.concatenate(
        [
            jnp.zeros((tp, 1, d), jnp.float32),
            y,
            jnp.zeros((tp, wp - w - 1, d), jnp.float32),
        ],
        axis=1,
    )
    o_ref[0] = yp.astype(o_ref.dtype)


def fused_affine_conv3x3_padded(
    parts,
    bias: jax.Array,
    hw: Tuple[int, int],
    silu: bool = True,
    tile_h: Optional[int] = None,
    interpret: bool = False,
):
    """conv3x3_same over a pre-padded stream, multi-part (split concat).

    Args:
      parts: list of (x, kernel, a, b): x (N, Hp, Wp, C_i) padded-stream
        activations (interior rows 1..H, cols 1..W; pad values arbitrary —
        masked in-kernel), kernel (3, 3, C_i, D), a/b the per-(N, C_i)
        float32 collapsed-GroupNorm affine (required). Parts are summed
        (the split-skip concat convolution, `PERF_SPLIT_SKIP`).
      bias: (D,), added once.
      hw: the interior (H, W).
    Returns (N, Hp, Wp, D) in the input dtype: interior + zeroed pad COLS
    written; pad ROWS (0 and Hp-1) left unwritten (garbage). Consumers —
    this kernel's own input mask, `temporal_conv_padded`'s row-skipping
    blocks, and `unpad_stream` — never read them.
    """
    h, w = hw
    hp, wp = padded_hw(h, w)
    n = parts[0][0].shape[0]
    d = parts[0][1].shape[-1]
    for x, kernel, a, b in parts:
        if x.shape[1] != hp or x.shape[2] != wp:
            raise ValueError(f"part shape {x.shape} vs padded ({hp},{wp})")
        if a is None or b is None:
            raise ValueError("padded-stream conv requires the affine")
    cins = [x.shape[-1] for x, *_ in parts]
    tp = tile_h or padded_band_rows(h, wp, cins, d)
    if h % tp:
        raise ValueError(f"tile_h {tp} must divide H={h}")

    from jax._src.pallas import core as _pc

    E = _pc.Element
    dtype = parts[0][0].dtype

    in_specs = []
    args = []
    for x, kernel, a, b in parts:
        c = x.shape[-1]
        in_specs.append(
            pl.BlockSpec(
                (E(1), E(tp + 2), E(wp), E(c)),
                lambda nn_, i: (nn_, i * tp, 0, 0),
            )
        )
        args.append(x)
        in_specs.append(pl.BlockSpec((n, c), lambda nn_, i: (0, 0)))
        args.append(a.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((n, c), lambda nn_, i: (0, 0)))
        args.append(b.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((9 * c, d), lambda nn_, i: (0, 0)))
        args.append(kernel.astype(dtype).reshape(9 * c, d))
    in_specs.append(pl.BlockSpec((1, d), lambda nn_, i: (0, 0)))
    args.append(bias.reshape(1, d))

    return pl.pallas_call(
        functools.partial(
            _padded_conv_kernel, tp=tp, h=h, w=w, wp=wp, cins=tuple(cins),
            d=d, silu=silu,
        ),
        grid=(n, h // tp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (E(1), E(tp), E(wp), E(d)),
            lambda nn_, i: (nn_, 1 + i * tp, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, d), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(*args)


def _tconv_padded_kernel(
    *refs, frames, tr, w, wp, has_emb, has_res, skip_cins, want_stats,
    join_t=False, join_s=False,
):
    """One (sample, row-band) step of the padded-stream temporal conv:
    block (F, tr, Wp, C) of INTERIOR padded rows (Element start 1+j*tr —
    garbage pad rows are never read or written). Whole-block per-tap dots
    over the frame-shifted views; output pad COLS masked to zero, so the
    emitted per-frame sum/sumsq statistics are exact interior statistics
    (no pad correction needed anywhere)."""
    idx = 0
    x_ref = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1
    b_ref = refs[idx]; idx += 1
    e_ref = res_ref = None
    if has_emb:
        e_ref = refs[idx]; idx += 1
    if has_res:
        res_ref = refs[idx]; idx += 1
    skip_refs = []
    sb_ref = None
    for _ in skip_cins:
        skip_refs.append(refs[idx]); idx += 1  # (1, F, tr, Wp, C_s)
        if not join_s:
            skip_refs.append(refs[idx]); idx += 1  # (C_s, C)
    if skip_cins:
        sb_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    stats_ref = refs[idx] if want_stats else None

    bb = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[0]  # (F, tr, Wp, C)
    c = x.shape[-1]
    bias = b_ref[0].astype(jnp.float32)
    if has_emb:
        nb = e_ref.shape[0]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) == bb
        ).astype(jnp.float32)
        e = jax.lax.dot_general(
            sel, e_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
        bias = bias + e[0]

    m = tr * wp
    zrow = jnp.zeros((1, tr, wp, c), x.dtype)
    xm1 = jnp.concatenate([zrow, x[:-1]], axis=0).reshape(frames * m, c)
    xp1 = jnp.concatenate([x[1:], zrow], axis=0).reshape(frames * m, c)
    x2 = x.reshape(frames * m, c)

    def tap(xs, wt):
        return jax.lax.dot_general(
            xs, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if join_t:
        # one wide contraction (V2A_TAPJOIN): [xm1, x2, xp1(, skips)]
        # against the host-stacked (3C(+sum Cs), C) weight
        join = [xm1, x2, xp1]
        if join_s:
            join += [skip_refs[si][0].reshape(frames * m, cs)
                     for si, cs in enumerate(skip_cins)]
        y = tap(jnp.concatenate(join, axis=1), w_ref[:])
        y = y + bias[None, :]
    else:
        w0, w1, w2 = w_ref[:c], w_ref[c:2 * c], w_ref[2 * c:]
        y = tap(x2, w1) + tap(xm1, w0) + tap(xp1, w2)
        y = y + bias[None, :]
    # fold the 1x1 skip projection so the projected residual never hits
    # HBM (under join_s it already rode the wide dot above)
    if not join_s:
        for si, cs in enumerate(skip_cins):
            xs = skip_refs[2 * si][0].reshape(frames * m, cs)
            y = y + jax.lax.dot_general(
                xs, skip_refs[2 * si + 1][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if skip_cins:
        y = y + sb_ref[0].astype(jnp.float32)[None, :]
    y = y.reshape(frames, tr, wp, c)
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    # zero the pad cols: keeps the stream's col pads exactly zero and the
    # statistics exact (rows in this block are all interior)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, tr, wp, 1), 2)
    y = jnp.where((cc >= 1) & (cc <= w), y, 0.0)
    y16 = y.astype(o_ref.dtype)
    o_ref[0] = y16
    if want_stats:
        yf = y16.astype(jnp.float32)
        row = jnp.stack(
            [jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))],
            axis=1,
        )  # (F, 2, C)

        @pl.when(j == 0)
        def _():
            stats_ref[0] = row

        @pl.when(j > 0)
        def _():
            stats_ref[0] = stats_ref[0] + row


def temporal_conv_padded(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    hw: Tuple[int, int],
    emb: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    skip_parts=None,
    skip_bias: Optional[jax.Array] = None,
    want_stats: bool = False,
    interpret: bool = False,
    tile_r: Optional[int] = None,
):
    """The 3-tap temporal conv on a padded stream.

    Args:
      x: (B, F, Hp, Wp, C) padded-stream activations (col pads zero, row
        pads arbitrary — row-banded blocks skip them).
      kernel: (3, C, C); bias: (C,); emb: optional (B, C); residual:
        optional (B, F, Hp, Wp, C) padded stream (only interior rows and
        col-pad zeros are consumed).
    Returns y (B, F, Hp, Wp, C) [, stats (B, F, 2, C) float32 — EXACT
    interior sum/sumsq, no pad correction needed].
    """
    h, w = hw
    b, f, hp, wp, c = x.shape
    if kernel.shape != (3, c, c):
        raise ValueError(f"temporal conv must be 3xCxC, got {kernel.shape}")
    if hp != h + 2:
        raise ValueError(f"padded rows {hp} vs interior {h}")

    skip_parts = skip_parts or []
    skip_cins = [xs.shape[-1] for xs, _ in skip_parts]
    if tile_r is None:
        # the skip blocks ride along at C_s channels each; the tap-join
        # concat buffer (V2A_TAPJOIN) adds a (F*m, 3C(+sum Cs)) operand
        eff_c = c + sum(skip_cins)
        if "t" in TAPJOIN:
            eff_c += 3 * c + (sum(skip_cins) if "s" in TAPJOIN else 0)
        max_rows = max(TCONV_TILE_BUDGET // (eff_c * 2 * 7), 8)
        tile_r = 1
        for t in range(1, h + 1):
            if h % t == 0 and t * wp <= max_rows:
                tile_r = t
    if h % tile_r:
        raise ValueError(f"tile_r {tile_r} must divide H={h}")

    from jax._src.pallas import core as _pc

    E = _pc.Element

    def band(bb, j):
        return (bb, 0, 1 + j * tile_r, 0, 0)

    join_t = "t" in TAPJOIN
    join_s = join_t and "s" in TAPJOIN and bool(skip_parts)

    spec5 = pl.BlockSpec((E(1), E(f), E(tile_r), E(wp), E(c)), band)
    w2d = kernel.reshape(3 * c, c).astype(x.dtype)
    if join_s:
        # stack the skip kernels under the temporal taps for the wide dot
        w2d = jnp.concatenate(
            [w2d] + [ks.reshape(xs.shape[-1], c).astype(x.dtype)
                     for xs, ks in skip_parts], axis=0,
        )
    in_specs = [
        spec5,
        pl.BlockSpec(w2d.shape, lambda bb, j: (0, 0)),
        pl.BlockSpec((1, c), lambda bb, j: (0, 0)),
    ]
    args = [x, w2d, bias.reshape(1, c)]
    if emb is not None:
        in_specs.append(pl.BlockSpec((b, c), lambda bb, j: (0, 0)))
        args.append(emb.reshape(b, c))
    if residual is not None:
        in_specs.append(spec5)
        args.append(residual)
    for xs, ks in skip_parts:
        cs = xs.shape[-1]
        in_specs.append(
            pl.BlockSpec((E(1), E(f), E(tile_r), E(wp), E(cs)), band)
        )
        args.append(xs)
        if not join_s:
            in_specs.append(pl.BlockSpec((cs, c), lambda bb, j: (0, 0)))
            args.append(ks.reshape(cs, c).astype(x.dtype))
    if skip_parts:
        in_specs.append(pl.BlockSpec((1, c), lambda bb, j: (0, 0)))
        args.append(skip_bias.reshape(1, c))

    out_shapes = [jax.ShapeDtypeStruct((b, f, hp, wp, c), x.dtype)]
    out_specs = [spec5]
    if want_stats:
        out_shapes.append(jax.ShapeDtypeStruct((b, f, 2, c), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, f, 2, c), lambda bb, j: (bb, 0, 0, 0))
        )

    outs = pl.pallas_call(
        functools.partial(
            _tconv_padded_kernel, frames=f, tr=tile_r, w=w, wp=wp,
            has_emb=emb is not None, has_res=residual is not None,
            skip_cins=tuple(skip_cins), want_stats=want_stats,
            join_t=join_t, join_s=join_s,
        ),
        grid=(b, h // tile_r),
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shapes if want_stats else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "arbitrary" if want_stats else "parallel"
            )
        ),
        interpret=interpret,
    )(*args)
    return outs


# -- padded-stream fused 2x-upsample + 3x3 conv ------------------------------
#
# conv3x3(nearest_upsample_2x(x)) collapses to FOUR parity convs over the
# LOW-RES input with 2x2-tap kernels (sums of adjacent taps): output hi
# row r = 2u+p+1 reads upsampled rows that map to lo rows {u, u+1} (p=0)
# or {u+1, u+2} (p=1), and likewise for columns. 4 parities x 4 taps =
# 16 (C, D) dots per band vs 9 at 4x the positions — 44% of the FLOPs,
# 1/4 of the input reads, and the upsampled activation (plus its XLA
# broadcast+pad passes) never exists in HBM. Parity assembly: columns
# stack + (W_lo, 2)->sublane merge reshape (verified supported by Mosaic
# for f32), rows merge on the outer dim.


def _upconv_kernel(
    *refs, tpl, h_lo, w_lo, wp_lo, wp_hi, cin, d, silu, has_affine,
):
    x_ref = refs[0]
    idx = 1
    a_ref = b_ref = None
    if has_affine:
        a_ref = refs[idx]; idx += 1
        b_ref = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1   # (16*C, D): [p][p'][a][b] tap blocks
    bias_ref = refs[idx]; idx += 1
    o_ref = refs[idx]

    nn_ = pl.program_id(0)
    i = pl.program_id(1)
    x = x_ref[0]  # (tpl+2, Wp_lo, C)
    xf = x.astype(jnp.float32)
    if has_affine:
        n_rows = a_ref.shape[0]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1) == nn_
        ).astype(jnp.float32)
        av = jax.lax.dot_general(
            sel, a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        bv = jax.lax.dot_general(
            sel, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        xf = xf * av[None, None, :] + bv[None, None, :]
        if silu:
            xf = _silu(xf, o_ref.dtype)
    # mask in LO padded coordinates (garbage pad rows -> exact zeros,
    # which reproduces the hi-res SAME-conv zero halo)
    rr = (
        jax.lax.broadcasted_iota(jnp.int32, (tpl + 2, wp_lo, 1), 0)
        + i * tpl
    )
    cc = jax.lax.broadcasted_iota(jnp.int32, (tpl + 2, wp_lo, 1), 1)
    keep = (rr >= 1) & (rr <= h_lo) & (cc >= 1) & (cc <= w_lo)
    xb = jnp.where(keep, xf, 0.0).astype(x_ref.dtype)

    bias = bias_ref[0].astype(jnp.float32)[None, :]
    rows_hi = []
    for p in range(2):
        cols = []
        for pp in range(2):
            acc = None
            for a in range(2):
                r0 = a + (1 if p else 0)
                sh = xb[r0:r0 + tpl]
                for b_ in range(2):
                    c0 = b_ + (1 if pp else 0)
                    xs = sh[:, c0:c0 + w_lo, :].reshape(tpl * w_lo, cin)
                    t = ((p * 2 + pp) * 2 + a) * 2 + b_
                    part = jax.lax.dot_general(
                        xs, w_ref[t * cin:(t + 1) * cin],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            cols.append((acc + bias).reshape(tpl, w_lo, 1, d))
        yrow = jnp.concatenate(cols, axis=2).reshape(tpl, 2 * w_lo, d)
        rows_hi.append(yrow.reshape(tpl, 1, 2 * w_lo, d))
    y = jnp.concatenate(rows_hi, axis=1).reshape(2 * tpl, 2 * w_lo, d)
    yp = jnp.concatenate(
        [
            jnp.zeros((2 * tpl, 1, d), jnp.float32),
            y,
            jnp.zeros((2 * tpl, wp_hi - 2 * w_lo - 1, d), jnp.float32),
        ],
        axis=1,
    )
    o_ref[0] = yp.astype(o_ref.dtype)


def upconv_band_rows(h_lo: int, wp_lo: int, c: int, d: int,
                     budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Low-res rows per band for the fused upsample-conv."""
    def cost(t):
        win = 2 * (t + 2) * wp_lo * c * 2
        out = 2 * 2 * t * 2 * wp_lo * d * 2
        acc = 2 * t * 2 * wp_lo * d * 4
        return win + out + acc + 16 * c * d * 2
    best = 1
    for t in range(1, h_lo + 1):
        if h_lo % t == 0 and cost(t) <= budget_bytes:
            best = max(best, t)
    return best


def fused_upconv3x3_padded(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    hw_lo: Tuple[int, int],
    a: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    silu: bool = False,
    tile_h: Optional[int] = None,
    interpret: bool = False,
):
    """y = conv3x3_same(nearest_upsample_2x(x)) on padded streams.

    Args:
      x: (N, Hp_lo, Wp_lo, C) LOW-RES padded stream (garbage pad rows OK).
      kernel: (3, 3, C, D); bias (D,); a/b optional per-(N, C) affine.
      hw_lo: low-res interior (H_lo, W_lo).
    Returns (N, Hp_hi, Wp_hi, D) padded stream at (2*H_lo, 2*W_lo):
    interior + zero pad cols written, pad rows unwritten.
    """
    h_lo, w_lo = hw_lo
    hp_lo, wp_lo = padded_hw(h_lo, w_lo)
    hp_hi, wp_hi = padded_hw(2 * h_lo, 2 * w_lo)
    n, c = x.shape[0], x.shape[-1]
    d = kernel.shape[-1]
    if x.shape[1] != hp_lo or x.shape[2] != wp_lo:
        raise ValueError(f"x {x.shape} vs padded lo ({hp_lo},{wp_lo})")
    tpl = tile_h or upconv_band_rows(h_lo, wp_lo, c, d)
    if h_lo % tpl:
        raise ValueError(f"tile_h {tpl} must divide H_lo={h_lo}")

    # collapsed 2x2 parity kernels: K_lo[p][pp][a][b] = sum of the 3x3
    # taps that land on lo offset (a, b) for output parity (p, pp)
    rows_sel = [[(0,), (1, 2)], [(0, 1), (2,)]]
    k_blocks = []
    for p in range(2):
        for pp in range(2):
            for a_ in range(2):
                for b_ in range(2):
                    kk = None
                    for di in rows_sel[p][a_]:
                        for dj in rows_sel[pp][b_]:
                            t = kernel[di, dj]
                            kk = t if kk is None else kk + t
                    k_blocks.append(kk)
    w2d = jnp.concatenate(k_blocks, axis=0).astype(x.dtype)  # (16C, D)

    from jax._src.pallas import core as _pc

    E = _pc.Element
    has_affine = a is not None

    in_specs = [
        pl.BlockSpec(
            (E(1), E(tpl + 2), E(wp_lo), E(c)),
            lambda nn_, i: (nn_, i * tpl, 0, 0),
        )
    ]
    args = [x]
    if has_affine:
        in_specs.append(pl.BlockSpec((n, c), lambda nn_, i: (0, 0)))
        args.append(a.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((n, c), lambda nn_, i: (0, 0)))
        args.append(b.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((16 * c, d), lambda nn_, i: (0, 0)))
    args.append(w2d)
    in_specs.append(pl.BlockSpec((1, d), lambda nn_, i: (0, 0)))
    args.append(bias.reshape(1, d))

    return pl.pallas_call(
        functools.partial(
            _upconv_kernel, tpl=tpl, h_lo=h_lo, w_lo=w_lo, wp_lo=wp_lo,
            wp_hi=wp_hi, cin=c, d=d, silu=silu, has_affine=has_affine,
        ),
        grid=(n, h_lo // tpl),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (E(1), E(2 * tpl), E(wp_hi), E(d)),
            lambda nn_, i: (nn_, 1 + i * 2 * tpl, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp_hi, wp_hi, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(*args)


# -- padded-stream fused stride-2 3x3 conv (downsample) ----------------------
#
# The stride-2 SAME conv on a padded stream, out in padded form at the
# halved resolution. Tap gathering at stride 2 uses parity splits:
# window rows (2tq+2) reshape to (tq+1, 2) row pairs (outer dims, free),
# columns split (Wp) -> (Wp/2, 2) on the sublane dim (verified supported
# by Mosaic, like the upconv's merge). The input mask makes the garbage
# pad rows exact zeros, reproducing the SAME-conv halo; the unpad slice,
# XLA conv relayouts, and the next level's pad_stream all disappear.


def _downconv_kernel(
    *refs, tq, h, w, wp, wp2, cin, d, silu, has_affine,
):
    x_ref = refs[0]
    idx = 1
    a_ref = b_ref = None
    if has_affine:
        a_ref = refs[idx]; idx += 1
        b_ref = refs[idx]; idx += 1
    w_ref = refs[idx]; idx += 1
    bias_ref = refs[idx]; idx += 1
    o_ref = refs[idx]

    nn_ = pl.program_id(0)
    i = pl.program_id(1)
    x = x_ref[0]  # (2*tq+2, Wp, C)
    xf = x.astype(jnp.float32)
    if has_affine:
        n_rows = a_ref.shape[0]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1) == nn_
        ).astype(jnp.float32)
        av = jax.lax.dot_general(
            sel, a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        bv = jax.lax.dot_general(
            sel, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        xf = xf * av[None, None, :] + bv[None, None, :]
        if silu:
            xf = _silu(xf, o_ref.dtype)
    rows = 2 * tq + 2
    rr = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 0) + 2 * i * tq
    )
    cc = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 1), 1)
    keep = (rr >= 1) & (rr <= h) & (cc >= 1) & (cc <= w)
    xm = jnp.where(keep, xf, 0.0)

    w2 = w // 2
    xr = xm.reshape(tq + 1, 2, wp, cin)  # row pairs (outer split, free)
    acc = None
    for dr in range(3):
        if dr == 0:
            rsl = xr[0:tq, 0]
        elif dr == 1:
            rsl = xr[0:tq, 1]
        else:
            rsl = xr[1:tq + 1, 0]
        # (tq, Wp, C) -> column parity split on the sublane dim
        csp = rsl.reshape(tq, wp // 2, 2, cin)
        for dc in range(3):
            if dc == 0:
                xs = csp[:, 0:w2, 0]
            elif dc == 1:
                xs = csp[:, 0:w2, 1]
            else:
                xs = csp[:, 1:w2 + 1, 0]
            t = dr * 3 + dc
            xs = xs.astype(x_ref.dtype).reshape(tq * w2, cin)
            part = jax.lax.dot_general(
                xs, w_ref[t * cin:(t + 1) * cin],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    y = acc + bias_ref[0].astype(jnp.float32)[None, :]
    y = y.reshape(tq, w2, d)
    yp = jnp.concatenate(
        [
            jnp.zeros((tq, 1, d), jnp.float32),
            y,
            jnp.zeros((tq, wp2 - w2 - 1, d), jnp.float32),
        ],
        axis=1,
    )
    o_ref[0] = yp.astype(o_ref.dtype)


def downconv_band_rows(h2: int, wp: int, c: int, d: int,
                       budget_bytes: int = 10 * 1024 * 1024) -> int:
    """Output rows per band for the stride-2 conv (input window is
    2*tq+2 rows of the full-res padded stream)."""
    weights = 9 * c * d * 2

    def cost(t):
        win = 2 * (2 * t + 2) * wp * c * 2
        ftmp = (2 * t + 2) * wp * c * 4
        out = 2 * t * (wp // 2 + 8) * d * 2
        acc = t * (wp // 2) * d * 4
        return weights + win + ftmp + out + acc

    best = 1
    for t in range(1, h2 + 1):
        if h2 % t == 0 and cost(t) <= budget_bytes:
            best = max(best, t)
    return best


def fused_downconv3x3_padded(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    hw: Tuple[int, int],
    a: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    silu: bool = False,
    tile_h: Optional[int] = None,
    interpret: bool = False,
):
    """y = conv3x3_stride2_same(x) on padded streams.

    Args:
      x: (N, Hp, Wp, C) padded stream at the full resolution (garbage pad
        rows OK — masked).
      kernel: (3, 3, C, D); bias (D,); a/b optional per-(N, C) affine.
      hw: full-res interior (H, W), both even.
    Returns (N, Hp2, Wp2, D) padded stream at (H/2, W/2).
    """
    h, w = hw
    hp, wp = padded_hw(h, w)
    h2, w2 = h // 2, w // 2
    hp2, wp2 = padded_hw(h2, w2)
    n, c = x.shape[0], x.shape[-1]
    d = kernel.shape[-1]
    if x.shape[1] != hp or x.shape[2] != wp:
        raise ValueError(f"x {x.shape} vs padded ({hp},{wp})")
    if h % 2 or w % 2 or wp % 2:
        raise ValueError("stride-2 conv needs even H, W, Wp")
    tq = tile_h or downconv_band_rows(h2, wp, c, d)
    if h2 % tq:
        raise ValueError(f"tile_h {tq} must divide H/2={h2}")

    from jax._src.pallas import core as _pc

    E = _pc.Element
    has_affine = a is not None

    in_specs = [
        pl.BlockSpec(
            (E(1), E(2 * tq + 2), E(wp), E(c)),
            lambda nn_, i: (nn_, 2 * i * tq, 0, 0),
        )
    ]
    args = [x]
    if has_affine:
        in_specs.append(pl.BlockSpec((n, c), lambda nn_, i: (0, 0)))
        args.append(a.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((n, c), lambda nn_, i: (0, 0)))
        args.append(b.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((9 * c, d), lambda nn_, i: (0, 0)))
    args.append(kernel.astype(x.dtype).reshape(9 * c, d))
    in_specs.append(pl.BlockSpec((1, d), lambda nn_, i: (0, 0)))
    args.append(bias.reshape(1, d))

    return pl.pallas_call(
        functools.partial(
            _downconv_kernel, tq=tq, h=h, w=w, wp=wp, wp2=wp2, cin=c,
            d=d, silu=silu, has_affine=has_affine,
        ),
        grid=(n, h2 // tq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (E(1), E(tq), E(wp2), E(d)),
            lambda nn_, i: (nn_, 1 + i * tq, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp2, wp2, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(*args)


# -- padded-stream fused spatial conv + temporal conv (mega-kernel) ----------


def _conv_tconv_kernel(
    *refs, tp, h, w, wp, cins, d, frames, silu, has_emb, has_res,
    skip_cins, want_stats, im2col, join_t=False, join_s=False,
    join_d=False, join_f=False, join_g=False,
):
    """One (sample, row-band) step of the whole PseudoConv3d: per-frame
    affine+SiLU+mask -> 3x3 conv (9 tap dots), then the 3-tap temporal mix
    across frames IN VMEM, + bias/emb/residual, one padded write + exact
    interior statistics. The conv output never round-trips HBM."""
    n_parts = len(cins)
    idx = 0
    x_refs, a_refs, b_refs, w_refs = [], [], [], []
    for _ in range(n_parts):
        x_refs.append(refs[idx]); idx += 1
        a_refs.append(refs[idx]); idx += 1
        b_refs.append(refs[idx]); idx += 1
        w_refs.append(refs[idx]); idx += 1
    kb_ref = refs[idx]; idx += 1   # (1, D) spatial bias
    tw_ref = refs[idx]; idx += 1   # (3D, D) temporal taps
    tb_ref = refs[idx]; idx += 1   # (1, D) temporal bias
    e_ref = res_ref = None
    if has_emb:
        e_ref = refs[idx]; idx += 1  # (B, D)
    if has_res:
        res_ref = refs[idx]; idx += 1  # (1, F, tp, Wp, D)
    skip_refs = []
    sb_ref = None
    for _ in skip_cins:
        skip_refs.append(refs[idx]); idx += 1  # (1, F, tp, Wp, C_s)
        if not join_s:
            skip_refs.append(refs[idx]); idx += 1  # (C_s, D)
    if skip_cins:
        sb_ref = refs[idx]; idx += 1  # (1, D) skip-conv bias
    o_ref = refs[idx]; idx += 1
    if want_stats:
        stats_ref = refs[idx]; idx += 1
    else:
        stats_ref = None
    im_ref = refs[idx] if im2col else None  # scratch (tp*W, 9*max(C))

    bb = pl.program_id(0)
    i = pl.program_id(1)

    # -- spatial conv per frame (affine rows are per (batch, frame)) --
    rr = jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 0) + i * tp
    cc = jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 1)
    keep = (rr >= 1) & (rr <= h) & (cc >= 1) & (cc <= w)
    if join_f or join_g:
        # frame-folded taps: every tap dot spans all frames (M = F*tp*W).
        # join_f affines the whole (F, tp+2, Wp, C) block at once (one big
        # f32 transient); join_g affines per frame (f32 transient stays one
        # frame wide) and stacks the bf16 results — same dots, ~3x less
        # VMEM, so the band picker keeps the full band height.
        acc = None
        for pi in range(n_parts):
            c = cins[pi]
            n_rows = a_refs[pi].shape[0]  # B*F
            if join_f:
                x = x_refs[pi][0]  # (F, tp+2, Wp, C)
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (frames, n_rows), 1)
                    == bb * frames
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (frames, n_rows), 0
                    )
                ).astype(jnp.float32)
                av = jax.lax.dot_general(
                    sel, a_refs[pi][:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (F, C)
                bv = jax.lax.dot_general(
                    sel, b_refs[pi][:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xf = (
                    x.astype(jnp.float32) * av[:, None, None, :]
                    + bv[:, None, None, :]
                )
                if silu:
                    xf = _silu(xf, o_ref.dtype)
                xb = jnp.where(keep[None], xf, 0.0).astype(x_refs[pi].dtype)
            else:
                rows = []
                for f in range(frames):
                    xfr = x_refs[pi][0, f]  # (tp+2, Wp, C)
                    sel = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
                        == bb * frames + f
                    ).astype(jnp.float32)
                    av = jax.lax.dot_general(
                        sel, a_refs[pi][:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )[0]
                    bv = jax.lax.dot_general(
                        sel, b_refs[pi][:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )[0]
                    xf = (
                        xfr.astype(jnp.float32) * av[None, None, :]
                        + bv[None, None, :]
                    )
                    if silu:
                        xf = _silu(xf, o_ref.dtype)
                    rows.append(
                        jnp.where(keep, xf, 0.0).astype(
                            x_refs[pi].dtype
                        )[None]
                    )
                xb = jnp.concatenate(rows, axis=0)  # (F, tp+2, Wp, C) bf16
            for dj in range(3):
                if join_d:
                    xcat = jnp.concatenate(
                        [xb[:, di:di + tp, dj:dj + w, :].reshape(
                            frames * tp * w, c)
                         for di in range(3)], axis=1,
                    )
                    part = jax.lax.dot_general(
                        xcat, w_refs[pi][dj * 3 * c:(dj + 1) * 3 * c],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
                else:
                    for di in range(3):
                        t = di * 3 + dj
                        xs = xb[:, di:di + tp, dj:dj + w, :].reshape(
                            frames * tp * w, c
                        )
                        part = jax.lax.dot_general(
                            xs, w_refs[pi][t * c:(t + 1) * c],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        acc = part if acc is None else acc + part
        yc = (
            acc + kb_ref[0].astype(jnp.float32)[None, :]
        ).astype(o_ref.dtype).reshape(frames, tp * w, d)
    else:
        yc = None
    yframes = []
    for f in range(0 if (join_f or join_g) else frames):
        acc = None
        for pi in range(n_parts):
            c = cins[pi]
            x = x_refs[pi][0, f]  # (tp+2, Wp, C)
            n_rows = a_refs[pi].shape[0]  # B*F
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
                == bb * frames + f
            ).astype(jnp.float32)
            av = jax.lax.dot_general(
                sel, a_refs[pi][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]
            bv = jax.lax.dot_general(
                sel, b_refs[pi][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]
            xf = x.astype(jnp.float32) * av[None, None, :] + bv[None, None, :]
            if silu:
                xf = _silu(xf, o_ref.dtype)
            xb = jnp.where(keep, xf, 0.0).astype(x_refs[pi].dtype)
            if im2col:
                # one (tp*W, 9C) x (9C, D) dot per part per frame instead
                # of 9 K=C dots: fewer MXU issues, deeper K
                for dj in range(3):
                    sh = xb[:, dj:dj + w, :]
                    for di in range(3):
                        t = di * 3 + dj
                        im_ref[:, t * c:(t + 1) * c] = (
                            sh[di:di + tp].reshape(tp * w, c)
                        )
                part = jax.lax.dot_general(
                    im_ref[:, :9 * c], w_refs[pi][:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            elif join_d:
                # per-column-shift join: the three row shifts concatenate
                # channel-wise in VMEM and contract against the dj-major
                # (3C, D) weight slab — 3 deep dots instead of 9 skinny
                # ones (the weight ref is dj-major when join_d is set)
                for dj in range(3):
                    sh = xb[:, dj:dj + w, :]
                    xcat = jnp.concatenate(
                        [sh[di:di + tp].reshape(tp * w, c)
                         for di in range(3)], axis=1,
                    )
                    part = jax.lax.dot_general(
                        xcat, w_refs[pi][dj * 3 * c:(dj + 1) * 3 * c],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
            else:
                for dj in range(3):
                    sh = xb[:, dj:dj + w, :]
                    for di in range(3):
                        t = di * 3 + dj
                        xs = sh[di:di + tp].reshape(tp * w, c)
                        part = jax.lax.dot_general(
                            xs, w_refs[pi][t * c:(t + 1) * c],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        acc = part if acc is None else acc + part
        yf = acc + kb_ref[0].astype(jnp.float32)[None, :]
        yframes.append(yf.astype(o_ref.dtype)[None])  # (1, tp*W, D)
    if not (join_f or join_g):
        yc = jnp.concatenate(yframes, axis=0)  # (F, tp*W, D) bf16 in VMEM

    # -- temporal 3-tap mix across frames --
    tbias = tb_ref[0].astype(jnp.float32)
    if has_emb:
        nb = e_ref.shape[0]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) == bb
        ).astype(jnp.float32)
        e = jax.lax.dot_general(
            sel, e_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tbias = tbias + e[0]
    m = tp * w
    zrow = jnp.zeros((1, m, d), yc.dtype)
    xm1 = jnp.concatenate([zrow, yc[:-1]], axis=0).reshape(frames * m, d)
    xp1 = jnp.concatenate([yc[1:], zrow], axis=0).reshape(frames * m, d)
    x2 = yc.reshape(frames * m, d)

    def tap(xs, wt):
        return jax.lax.dot_general(
            xs, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if join_t:
        # one wide contraction: rows [w0; w1; w2] of tw_ref match the
        # [xm1, x2, xp1] concat order; with join_s the host appended the
        # skip kernels below the temporal taps
        join = [xm1, x2, xp1]
        if join_s:
            for si, cs in enumerate(skip_cins):
                join.append(
                    skip_refs[si][0][:, :, 1:w + 1, :].reshape(
                        frames * m, cs
                    )
                )
        y = tap(jnp.concatenate(join, axis=1), tw_ref[:])
        y = y + tbias[None, :]
    else:
        w0, w1, w2 = tw_ref[:d], tw_ref[d:2 * d], tw_ref[2 * d:]
        y = tap(x2, w1) + tap(xm1, w0) + tap(xp1, w2)
        y = y + tbias[None, :]
    y = y.reshape(frames * tp * w, d)
    # fold the 1x1 skip projection (sum over split parts) directly into
    # the temporal output: the projected residual never exists in HBM
    if not join_s:
        for si, cs in enumerate(skip_cins):
            xs_ref = skip_refs[2 * si]
            ks_ref = skip_refs[2 * si + 1]
            xs = xs_ref[0][:, :, 1:w + 1, :].reshape(frames * tp * w, cs)
            y = y + jax.lax.dot_general(
                xs, ks_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if skip_cins:
        y = y + sb_ref[0].astype(jnp.float32)[None, :]
    y = y.reshape(frames, tp, w, d)
    if has_res:
        y = y + res_ref[0][:, :, 1:w + 1, :].astype(jnp.float32)
    y16i = y.astype(o_ref.dtype)  # interior (F, tp, W, D)
    # pad cols in f32 then cast (no bf16 sublane rotate on Mosaic)
    yp = jnp.concatenate(
        [
            jnp.zeros((frames, tp, 1, d), jnp.float32),
            y,
            jnp.zeros((frames, tp, wp - w - 1, d), jnp.float32),
        ],
        axis=2,
    )
    o_ref[0] = yp.astype(o_ref.dtype)
    if want_stats:
        yf32 = y16i.astype(jnp.float32)
        row = jnp.stack(
            [jnp.sum(yf32, axis=(1, 2)), jnp.sum(yf32 * yf32, axis=(1, 2))],
            axis=1,
        )  # (F, 2, D)

        @pl.when(i == 0)
        def _():
            stats_ref[0] = row

        @pl.when(i > 0)
        def _():
            stats_ref[0] = stats_ref[0] + row


def conv_tconv_band_rows(h: int, w: int, wp: int, cins, d: int,
                         frames: int, has_res: bool = True,
                         skip_cins=(),
                         budget_bytes: int = 13 * 1024 * 1024) -> int:
    """Band size for the mega-kernel, or 0 if it is not viable at this
    shape. All F frames of the band live in VMEM at once; the estimate
    includes the double-buffered IO blocks, the weight matrices (4.7 MB
    alone at C=D=512 — the term the first version missed, which OOM'd the
    16 MB scoped vmem at the 512-channel upsample conv), and the f32
    per-frame temporaries. Bands with under 256 output rows per dot are
    rejected as MXU-inefficient."""
    weights = (
        sum(9 * c * d * 2 for c in cins) + 3 * d * d * 2
        + sum(c * d * 2 for c in skip_cins)
    )

    def cost(t):
        win = sum(2 * frames * (t + 2) * wp * c * 2 for c in cins)
        out = 2 * frames * t * wp * d * 2
        res = out if has_res else 0
        skip = sum(2 * frames * t * wp * c * 2 for c in skip_cins)
        yc = frames * t * w * d * 2
        acc = frames * t * w * d * 4
        ftmp = (t + 2) * wp * max(cins) * 4 + t * w * d * 4
        joinbuf = 0
        if "t" in TAPJOIN:
            # the wide-dot concat operand (V2A_TAPJOIN)
            ks = sum(skip_cins) if "s" in TAPJOIN else 0
            joinbuf = frames * t * w * (3 * d + ks) * 2
        if "d" in TAPJOIN:
            fold = "f" in TAPJOIN or "g" in TAPJOIN
            m_rows = (frames if fold else 1) * t * w
            joinbuf = max(joinbuf, m_rows * 3 * max(cins) * 2)
        if "g" in TAPJOIN:
            # frame-gathered bf16 stack (the f32 affine transient stays one
            # frame wide, so only the stack itself is new VMEM)
            joinbuf += frames * (t + 2) * wp * max(cins) * 2
        elif "f" in TAPJOIN:
            # whole-block affine output (bf16) + its f32 transient
            joinbuf += frames * (t + 2) * wp * max(cins) * 6
        return weights + win + out + res + skip + yc + acc + ftmp + joinbuf

    best = 0
    for t in range(1, h + 1):
        if h % t == 0 and cost(t) <= budget_bytes:
            best = max(best, t)
    if best * w < MEGA_MIN_M:
        return 0
    return best


# minimum rows-per-dot for the mega kernel to engage; 128 lets the L2
# single-part blocks in (K = 9*384 is deep enough to carry M=128)
MEGA_MIN_M = int(os.environ.get("V2A_MEGA_MIN_M", "256"))
MEGA_IM2COL = os.environ.get("V2A_MEGA_IM2COL", "0") == "1"

# V2A_TAPJOIN: restructure skinny per-tap dots into fewer, wider-K
# contractions (round-3 attack on the mega kernel's ~1.1 ms/call MXU
# fill/drain residual, PERF.md round-2c microbench). Any subset of:
#   "t" — temporal 3-tap join: one (M, 3D) x (3D, D) dot over the
#         VMEM-resident conv output (no HBM concat — the round-2 failure
#         mode) instead of three K=D dots + two VPU adds
#   "s" — fold the 1x1 skip projections into the same wide dot (the host
#         concatenates the skip kernels under the temporal taps)
#   "d" — spatial per-column-shift join in the mega kernel: three
#         (M, 3C) x (3C, D) dots (dj-major weight layout) instead of nine
#         K=C tap dots
#   "f" — frame-folded spatial taps in the mega kernel: the affine+SiLU
#         applies to the whole (F, tp+2, Wp, C) block at once and each tap
#         dot spans all frames (M = F*tp*W, 7x deeper) — 9 dots per part
#         per band instead of 63
#   "g" — frame-GATHERED taps: same frame-folded dots as "f" but the
#         affine+SiLU runs per frame and stacks bf16 results, so the f32
#         transient stays one frame wide (~3x less VMEM than "f" — the
#         band picker keeps the full band height). Overrides "f".
# Read at call time (module attribute) so perf_lab can toggle it.
# Default OFF (per-tap dots): the standalone one-fwd sweep (PERF.md
# round 3) measured "f" at 143.3 ms/fwd vs 152.0 per-tap, but the
# headline DDIM-100 chain — the number that matters, median over 7
# chained iterations — runs ~1.6 ms/fwd FASTER with per-tap dots
# (11.018 s/iter vs 11.180; attn on: 11.020 vs 11.268). Single-shot
# raw-ms readings sit inside the axon tunnel's multi-ms drift band;
# the chain medians are reproducible to ±0.01 s. Variants stay
# available via V2A_TAPJOIN (t/s/d/f subsets, see above); parity gate
# covers both settings (scripts/verify_onchip.py, PASS).
TAPJOIN = os.environ.get("V2A_TAPJOIN", "")


def fused_conv_tconv_padded(
    parts,
    kbias: jax.Array,
    tkernel: jax.Array,
    tbias: jax.Array,
    hw: Tuple[int, int],
    emb: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    skip_parts=None,
    skip_bias: Optional[jax.Array] = None,
    silu: bool = True,
    want_stats: bool = False,
    tile_h: Optional[int] = None,
    im2col: Optional[bool] = None,
    interpret: bool = False,
):
    """The whole padded-stream PseudoConv3d in ONE kernel: multi-part
    affine+SiLU 3x3 conv -> 3-tap temporal conv -> + bias/emb/residual,
    with exact interior GroupNorm statistics. Parts are (x, kernel, a, b)
    with x (B, F, Hp, Wp, C_i); returns (B, F, Hp, Wp, D) padded stream
    [, stats (B, F, 2, D)]. The intermediate conv activation never exists
    in HBM (saves one full write + read per call vs the two-kernel form).
    """
    h, w = hw
    hp, wp = padded_hw(h, w)
    b, frames = parts[0][0].shape[:2]
    d = parts[0][1].shape[-1]
    for x, kernel, a, b_ in parts:
        if x.shape[2] != hp or x.shape[3] != wp:
            raise ValueError(f"part shape {x.shape} vs padded ({hp},{wp})")
        if a is None or b_ is None:
            raise ValueError("padded-stream conv requires the affine")
    cins = [x.shape[-1] for x, *_ in parts]
    skip_parts = skip_parts or []
    skip_cins = [x.shape[-1] for x, _ in skip_parts]
    tp = tile_h or conv_tconv_band_rows(
        h, w, wp, cins, d, frames, has_res=residual is not None,
        skip_cins=skip_cins,
    )
    if not tp:
        raise ValueError("mega-kernel not viable at this shape; gate with "
                         "conv_tconv_band_rows before calling")
    if h % tp:
        raise ValueError(f"tile_h {tp} must divide H={h}")

    from jax._src.pallas import core as _pc

    E = _pc.Element
    dtype = parts[0][0].dtype

    def win_idx(bb, i):
        return (bb, 0, i * tp, 0, 0)

    def out_idx(bb, i):
        return (bb, 0, 1 + i * tp, 0, 0)

    join_t = "t" in TAPJOIN
    join_s = join_t and "s" in TAPJOIN and bool(skip_parts)
    join_d = "d" in TAPJOIN
    join_g = "g" in TAPJOIN
    join_f = "f" in TAPJOIN and not join_g

    in_specs = []
    args = []
    for x, kernel, a, b_ in parts:
        c = x.shape[-1]
        in_specs.append(
            pl.BlockSpec((E(1), E(frames), E(tp + 2), E(wp), E(c)), win_idx)
        )
        args.append(x)
        in_specs.append(
            pl.BlockSpec((b * frames, c), lambda bb, i: (0, 0))
        )
        args.append(a.astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec((b * frames, c), lambda bb, i: (0, 0))
        )
        args.append(b_.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((9 * c, d), lambda bb, i: (0, 0)))
        w9 = kernel.astype(dtype).reshape(3, 3, c, d)
        if join_d:
            # dj-major layout: row block dj*3C + di*C holds tap (di, dj),
            # matching the kernel's per-column-shift concat order
            w9 = w9.transpose(1, 0, 2, 3)
        args.append(w9.reshape(9 * c, d))
    in_specs.append(pl.BlockSpec((1, d), lambda bb, i: (0, 0)))
    args.append(kbias.reshape(1, d))
    tw = tkernel.reshape(3 * d, d).astype(dtype)
    if join_s:
        # append the skip kernels below the temporal taps: the kernel's
        # wide dot contracts [xm1, x2, xp1, skip...] in one pass
        tw = jnp.concatenate(
            [tw] + [ks.reshape(xs.shape[-1], d).astype(dtype)
                    for xs, ks in skip_parts], axis=0,
        )
    in_specs.append(pl.BlockSpec(tw.shape, lambda bb, i: (0, 0)))
    args.append(tw)
    in_specs.append(pl.BlockSpec((1, d), lambda bb, i: (0, 0)))
    args.append(tbias.reshape(1, d))
    if emb is not None:
        in_specs.append(pl.BlockSpec((b, d), lambda bb, i: (0, 0)))
        args.append(emb.reshape(b, d))
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((E(1), E(frames), E(tp), E(wp), E(d)), out_idx)
        )
        args.append(residual)
    for xs, ks in skip_parts:
        cs = xs.shape[-1]
        in_specs.append(
            pl.BlockSpec((E(1), E(frames), E(tp), E(wp), E(cs)), out_idx)
        )
        args.append(xs)
        if not join_s:
            in_specs.append(pl.BlockSpec((cs, d), lambda bb, i: (0, 0)))
            args.append(ks.reshape(cs, d).astype(dtype))
    if skip_parts:
        in_specs.append(pl.BlockSpec((1, d), lambda bb, i: (0, 0)))
        args.append(skip_bias.reshape(1, d))

    out_shapes = [jax.ShapeDtypeStruct((b, frames, hp, wp, d), dtype)]
    out_specs = [
        pl.BlockSpec((E(1), E(frames), E(tp), E(wp), E(d)), out_idx)
    ]
    if want_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, frames, 2, d), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, frames, 2, d), lambda bb, i: (bb, 0, 0, 0))
        )

    if im2col is None:
        im2col = (
            MEGA_IM2COL
            and tp * w * 9 * max(cins) * 2 <= 3 * 1024 * 1024
        )
    scratch = (
        [pltpu.VMEM((tp * w, 9 * max(cins)), dtype)] if im2col else []
    )
    outs = pl.pallas_call(
        functools.partial(
            _conv_tconv_kernel, tp=tp, h=h, w=w, wp=wp, cins=tuple(cins),
            d=d, frames=frames, silu=silu, has_emb=emb is not None,
            has_res=residual is not None, skip_cins=tuple(skip_cins),
            want_stats=want_stats, im2col=im2col, join_t=join_t,
            join_s=join_s, join_d=join_d, join_f=join_f, join_g=join_g,
        ),
        grid=(b, h // tp),
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shapes if want_stats else out_shapes[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "arbitrary" if want_stats else "parallel"
            )
        ),
        interpret=interpret,
    )(*args)
    return outs


# -- padded-stream conv+tconv with manual double-buffered DMA ----------------
#
# The BlockSpec-pipelined mega-kernel leaves ~1.2 ms/call of window DMA
# un-overlapped with compute (chained-slope microbench, PERF.md). This
# variant takes the HBM refs directly (memory_space=ANY), loops the row
# bands inside ONE grid step per batch sample, and double-buffers every
# stream with explicit `pltpu.make_async_copy`: band i+1's windows load
# while band i computes, and band i's output stores while band i+1
# computes — the pallas-guide double-buffering pattern.


def _conv_tconv_dma_kernel(
    *refs, tp, h, w, wp, cins, d, frames, silu, has_emb, has_res,
    skip_cins, want_stats, n_bands,
):
    n_parts = len(cins)
    n_skip = len(skip_cins)
    idx = 0
    x_refs, a_refs, b_refs, w_refs = [], [], [], []
    for _ in range(n_parts):
        x_refs.append(refs[idx]); idx += 1   # (B, F, Hp, Wp, C) in HBM
        a_refs.append(refs[idx]); idx += 1
        b_refs.append(refs[idx]); idx += 1
        w_refs.append(refs[idx]); idx += 1
    kb_ref = refs[idx]; idx += 1
    tw_ref = refs[idx]; idx += 1
    tb_ref = refs[idx]; idx += 1
    e_ref = res_ref = None
    if has_emb:
        e_ref = refs[idx]; idx += 1
    if has_res:
        res_ref = refs[idx]; idx += 1       # (B, F, Hp, Wp, D) in HBM
    skip_hbm, skip_w = [], []
    sb_ref = None
    for _ in range(n_skip):
        skip_hbm.append(refs[idx]); idx += 1
        skip_w.append(refs[idx]); idx += 1
    if n_skip:
        sb_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1             # (B, F, Hp, Wp, D) in HBM
    if want_stats:
        stats_ref = refs[idx]; idx += 1     # (1, F, 2, D) block
    else:
        stats_ref = None
    xwins = [refs[idx + k] for k in range(n_parts)]; idx += n_parts
    reswin = None
    if has_res:
        reswin = refs[idx]; idx += 1
    swins = [refs[idx + k] for k in range(n_skip)]; idx += n_skip
    stage = refs[idx]; idx += 1             # (2, F, tp, Wp, D) bf16
    stats_acc = refs[idx] if want_stats else None
    if want_stats:
        idx += 1
    in_sems = refs[idx]; idx += 1           # DMA sems (n_streams, 2)
    out_sems = refs[idx]                    # DMA sems (2,)

    bb = pl.program_id(0)

    def win_dma(pi, slot, i):
        return pltpu.make_async_copy(
            x_refs[pi].at[bb, :, pl.ds(i * tp, tp + 2)],
            xwins[pi].at[slot],
            in_sems.at[pi, slot],
        )

    def res_dma(slot, i):
        return pltpu.make_async_copy(
            res_ref.at[bb, :, pl.ds(1 + i * tp, tp)],
            reswin.at[slot],
            in_sems.at[n_parts, slot],
        )

    def skip_dma(si, slot, i):
        return pltpu.make_async_copy(
            skip_hbm[si].at[bb, :, pl.ds(1 + i * tp, tp)],
            swins[si].at[slot],
            in_sems.at[n_parts + (1 if has_res else 0) + si, slot],
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            stage.at[slot],
            o_ref.at[bb, :, pl.ds(1 + i * tp, tp)],
            out_sems.at[slot],
        )

    def start_all(slot, i):
        for pi in range(n_parts):
            win_dma(pi, slot, i).start()
        if has_res:
            res_dma(slot, i).start()
        for si in range(n_skip):
            skip_dma(si, slot, i).start()

    def wait_all(slot, i):
        for pi in range(n_parts):
            win_dma(pi, slot, i).wait()
        if has_res:
            res_dma(slot, i).wait()
        for si in range(n_skip):
            skip_dma(si, slot, i).wait()

    if want_stats:
        stats_acc[...] = jnp.zeros(stats_acc.shape, stats_acc.dtype)

    start_all(0, 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_bands)
        def _():
            start_all(nxt, i + 1)

        wait_all(slot, i)

        rr = (
            jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 0) + i * tp
        )
        cc = jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 1)
        keep = (rr >= 1) & (rr <= h) & (cc >= 1) & (cc <= w)
        yframes = []
        for f in range(frames):
            acc = None
            for pi in range(n_parts):
                c = cins[pi]
                x = xwins[pi][slot, f]  # (tp+2, Wp, C)
                n_rows = a_refs[pi].shape[0]
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
                    == bb * frames + f
                ).astype(jnp.float32)
                av = jax.lax.dot_general(
                    sel, a_refs[pi][:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[0]
                bv = jax.lax.dot_general(
                    sel, b_refs[pi][:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[0]
                xf = (
                    x.astype(jnp.float32) * av[None, None, :]
                    + bv[None, None, :]
                )
                if silu:
                    xf = _silu(xf, stage.dtype)
                xb = jnp.where(keep, xf, 0.0).astype(stage.dtype)
                for dj in range(3):
                    sh = xb[:, dj:dj + w, :]
                    for di in range(3):
                        t = di * 3 + dj
                        xs = sh[di:di + tp].reshape(tp * w, c)
                        part = jax.lax.dot_general(
                            xs, w_refs[pi][t * c:(t + 1) * c],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        acc = part if acc is None else acc + part
            yf = acc + kb_ref[0].astype(jnp.float32)[None, :]
            yframes.append(yf.astype(stage.dtype)[None])
        yc = jnp.concatenate(yframes, axis=0)  # (F, tp*W, D)

        tbias = tb_ref[0].astype(jnp.float32)
        if has_emb:
            nb = e_ref.shape[0]
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) == bb
            ).astype(jnp.float32)
            e = jax.lax.dot_general(
                sel, e_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tbias = tbias + e[0]
        m = tp * w
        zrow = jnp.zeros((1, m, d), yc.dtype)
        xm1 = jnp.concatenate([zrow, yc[:-1]], axis=0).reshape(frames * m, d)
        xp1 = jnp.concatenate([yc[1:], zrow], axis=0).reshape(frames * m, d)
        x2 = yc.reshape(frames * m, d)
        w0, w1, w2 = tw_ref[:d], tw_ref[d:2 * d], tw_ref[2 * d:]

        def tap(xs, wt):
            return jax.lax.dot_general(
                xs, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        y = tap(x2, w1) + tap(xm1, w0) + tap(xp1, w2)
        y = y + tbias[None, :]
        for si, cs in enumerate(skip_cins):
            xs = swins[si][slot][:, :, 1:w + 1, :].reshape(frames * m, cs)
            y = y + jax.lax.dot_general(
                xs, skip_w[si][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if n_skip:
            y = y + sb_ref[0].astype(jnp.float32)[None, :]
        y = y.reshape(frames, tp, w, d)
        if has_res:
            y = y + reswin[slot][:, :, 1:w + 1, :].astype(jnp.float32)
        y16i = y.astype(stage.dtype)
        if want_stats:
            yf32 = y16i.astype(jnp.float32)
            stats_acc[...] = stats_acc[...] + jnp.stack(
                [jnp.sum(yf32, axis=(1, 2)), jnp.sum(yf32 * yf32, axis=(1, 2))],
                axis=1,
            )
        yp = jnp.concatenate(
            [
                jnp.zeros((frames, tp, 1, d), jnp.float32),
                y,
                jnp.zeros((frames, tp, wp - w - 1, d), jnp.float32),
            ],
            axis=2,
        )

        # the store of band i-2 used this staging slot: drain it first
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        stage[slot] = yp.astype(stage.dtype)
        out_dma(slot, i).start()
        return 0

    jax.lax.fori_loop(0, n_bands, body, 0)

    # drain the in-flight output stores (n_bands is static)
    if n_bands >= 2:
        out_dma((n_bands - 2) % 2, n_bands - 2).wait()
    out_dma((n_bands - 1) % 2, n_bands - 1).wait()

    if want_stats:
        stats_ref[0] = stats_acc[...]


def fused_conv_tconv_dma(
    parts,
    kbias: jax.Array,
    tkernel: jax.Array,
    tbias: jax.Array,
    hw: Tuple[int, int],
    emb: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    skip_parts=None,
    skip_bias: Optional[jax.Array] = None,
    silu: bool = True,
    want_stats: bool = False,
    tile_h: Optional[int] = None,
    interpret: bool = False,
):
    """`fused_conv_tconv_padded` with manual double-buffered DMA (same
    contract; see the module comment above)."""
    h, w = hw
    hp, wp = padded_hw(h, w)
    b, frames = parts[0][0].shape[:2]
    d = parts[0][1].shape[-1]
    cins = [x.shape[-1] for x, *_ in parts]
    skip_parts = skip_parts or []
    skip_cins = [x.shape[-1] for x, _ in skip_parts]
    tp = tile_h or conv_tconv_band_rows(
        h, w, wp, cins, d, frames, has_res=residual is not None,
        skip_cins=skip_cins,
    )
    if not tp:
        raise ValueError("mega-kernel not viable at this shape")
    if h % tp:
        raise ValueError(f"tile_h {tp} must divide H={h}")
    n_bands = h // tp
    dtype = parts[0][0].dtype

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = []
    args = []
    for x, kernel, a, b_ in parts:
        c = x.shape[-1]
        in_specs.append(any_spec)
        args.append(x)
        in_specs.append(pl.BlockSpec((b * frames, c), lambda bb: (0, 0)))
        args.append(a.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((b * frames, c), lambda bb: (0, 0)))
        args.append(b_.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((9 * c, d), lambda bb: (0, 0)))
        args.append(kernel.astype(dtype).reshape(9 * c, d))
    in_specs.append(pl.BlockSpec((1, d), lambda bb: (0, 0)))
    args.append(kbias.reshape(1, d))
    in_specs.append(pl.BlockSpec((3 * d, d), lambda bb: (0, 0)))
    args.append(tkernel.reshape(3 * d, d).astype(dtype))
    in_specs.append(pl.BlockSpec((1, d), lambda bb: (0, 0)))
    args.append(tbias.reshape(1, d))
    if emb is not None:
        in_specs.append(pl.BlockSpec((b, d), lambda bb: (0, 0)))
        args.append(emb.reshape(b, d))
    if residual is not None:
        in_specs.append(any_spec)
        args.append(residual)
    for xs, ks in skip_parts:
        cs = xs.shape[-1]
        in_specs.append(any_spec)
        args.append(xs)
        in_specs.append(pl.BlockSpec((cs, d), lambda bb: (0, 0)))
        args.append(ks.reshape(cs, d).astype(dtype))
    if skip_parts:
        in_specs.append(pl.BlockSpec((1, d), lambda bb: (0, 0)))
        args.append(skip_bias.reshape(1, d))

    out_shapes = [jax.ShapeDtypeStruct((b, frames, hp, wp, d), dtype)]
    out_specs = [any_spec]
    if want_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, frames, 2, d), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, frames, 2, d), lambda bb: (bb, 0, 0, 0))
        )

    n_streams = len(parts) + (1 if residual is not None else 0) + len(skip_parts)
    scratch = [
        pltpu.VMEM((2, frames, tp + 2, wp, c), dtype) for c in cins
    ]
    if residual is not None:
        scratch.append(pltpu.VMEM((2, frames, tp, wp, d), dtype))
    for cs in skip_cins:
        scratch.append(pltpu.VMEM((2, frames, tp, wp, cs), dtype))
    scratch.append(pltpu.VMEM((2, frames, tp, wp, d), dtype))  # stage
    if want_stats:
        scratch.append(pltpu.VMEM((frames, 2, d), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((n_streams, 2)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    outs = pl.pallas_call(
        functools.partial(
            _conv_tconv_dma_kernel, tp=tp, h=h, w=w, wp=wp,
            cins=tuple(cins), d=d, frames=frames, silu=silu,
            has_emb=emb is not None, has_res=residual is not None,
            skip_cins=tuple(skip_cins), want_stats=want_stats,
            n_bands=n_bands,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shapes if want_stats else out_shapes[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(*args)
    return outs


# -- padded-stream frame-streaming conv+tconv --------------------------------
#
# The all-frames mega-kernel caps the band at tp=4 (every frame's window
# lives in VMEM at once) which starves the MXU (M = tp*W = 512 at L0).
# The streaming variant adds the frame axis to the GRID and keeps a
# 3-slot ring of conv outputs in persistent scratch: step (b, i, f)
# convolves frame f into ring[f%3] and emits the temporal output for
# frame f-1 — one frame's window in VMEM at a time, so tp grows 4x and
# the conv dots hit full MXU tiles.


def _conv_tconv_stream_kernel(
    *refs, tp, h, w, wp, cins, d, frames, silu, has_emb, has_res,
    want_stats,
):
    n_parts = len(cins)
    idx = 0
    x_refs, a_refs, b_refs, w_refs = [], [], [], []
    for _ in range(n_parts):
        x_refs.append(refs[idx]); idx += 1
        a_refs.append(refs[idx]); idx += 1
        b_refs.append(refs[idx]); idx += 1
        w_refs.append(refs[idx]); idx += 1
    kb_ref = refs[idx]; idx += 1
    tw_ref = refs[idx]; idx += 1
    tb_ref = refs[idx]; idx += 1
    e_ref = res_ref = None
    if has_emb:
        e_ref = refs[idx]; idx += 1
    if has_res:
        res_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    if want_stats:
        stats_ref = refs[idx]; idx += 1
    ring = refs[idx]  # scratch (3, tp, W, D) in o_ref.dtype

    bb = pl.program_id(0)
    i = pl.program_id(1)
    f = pl.program_id(2)

    @pl.when(f < frames)
    def _():
        rr = (
            jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 0) + i * tp
        )
        cc = jax.lax.broadcasted_iota(jnp.int32, (tp + 2, wp, 1), 1)
        keep = (rr >= 1) & (rr <= h) & (cc >= 1) & (cc <= w)
        acc = None
        for pi in range(n_parts):
            c = cins[pi]
            x = x_refs[pi][0, 0]  # (tp+2, Wp, C) — frame f's window
            n_rows = a_refs[pi].shape[0]
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
                == bb * frames + f
            ).astype(jnp.float32)
            av = jax.lax.dot_general(
                sel, a_refs[pi][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]
            bv = jax.lax.dot_general(
                sel, b_refs[pi][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]
            xf = x.astype(jnp.float32) * av[None, None, :] + bv[None, None, :]
            if silu:
                xf = _silu(xf, o_ref.dtype)
            xb = jnp.where(keep, xf, 0.0).astype(x_refs[pi].dtype)
            for dj in range(3):
                sh = xb[:, dj:dj + w, :]
                for di in range(3):
                    t = di * 3 + dj
                    xs = sh[di:di + tp].reshape(tp * w, c)
                    part = jax.lax.dot_general(
                        xs, w_refs[pi][t * c:(t + 1) * c],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
        yf = acc + kb_ref[0].astype(jnp.float32)[None, :]
        ring[f % 3] = yf.reshape(tp, w, d).astype(o_ref.dtype)

    @pl.when(f >= 1)
    def _():
        # temporal mix for frame f-1: taps f-2 / f-1 / f. Missing
        # neighbours select to zero (jnp.where — NaN-safe against the
        # ring's uninitialized first-band slots).
        cur = ring[(f - 1) % 3]
        prev = jnp.where(f >= 2, ring[(f + 1) % 3], 0.0)  # (f-2) % 3
        nxt = jnp.where(f <= frames - 1, ring[f % 3], 0.0)
        w0, w1, w2 = tw_ref[:d], tw_ref[d:2 * d], tw_ref[2 * d:]

        def tap(xs, wt):
            return jax.lax.dot_general(
                xs.reshape(tp * w, d), wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        y = tap(cur, w1) + tap(prev, w0) + tap(nxt, w2)
        tbias = tb_ref[0].astype(jnp.float32)
        if has_emb:
            nb = e_ref.shape[0]
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) == bb
            ).astype(jnp.float32)
            e = jax.lax.dot_general(
                sel, e_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tbias = tbias + e[0]
        y = y + tbias[None, :]
        y = y.reshape(tp, w, d)
        if has_res:
            y = y + res_ref[0, 0][:, 1:w + 1, :].astype(jnp.float32)
        y16 = y.astype(o_ref.dtype)
        yp = jnp.concatenate(
            [
                jnp.zeros((tp, 1, d), jnp.float32),
                y,
                jnp.zeros((tp, wp - w - 1, d), jnp.float32),
            ],
            axis=1,
        )
        o_ref[0, 0] = yp.astype(o_ref.dtype)
        if want_stats:
            yf32 = y16.astype(jnp.float32)
            row = jnp.stack(
                [jnp.sum(yf32, axis=(0, 1)), jnp.sum(yf32 * yf32, axis=(0, 1))],
                axis=0,
            )  # (2, D)

            @pl.when(i == 0)
            def _():
                stats_ref[0, f - 1] = row

            @pl.when(i > 0)
            def _():
                stats_ref[0, f - 1] = stats_ref[0, f - 1] + row


def stream_band_rows(h: int, w: int, wp: int, cins, d: int,
                     budget_bytes: int = 11 * 1024 * 1024) -> int:
    """Band size for the streaming mega-kernel: ONE frame's window in
    VMEM plus the 3-slot ring."""
    weights = sum(9 * c * d * 2 for c in cins) + 3 * d * d * 2

    def cost(t):
        win = sum(2 * (t + 2) * wp * c * 2 for c in cins)
        ring3 = 3 * t * w * d * 2
        out = 2 * t * wp * d * 2
        res = out
        acc = t * w * d * 4
        ftmp = (t + 2) * wp * max(cins) * 4
        return weights + win + ring3 + out + res + acc + ftmp

    best = 0
    for t in range(1, h + 1):
        if h % t == 0 and cost(t) <= budget_bytes:
            best = max(best, t)
    if best * w < 256:
        return 0
    return best


def fused_conv_tconv_stream(
    parts,
    kbias: jax.Array,
    tkernel: jax.Array,
    tbias: jax.Array,
    hw: Tuple[int, int],
    emb: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    silu: bool = True,
    want_stats: bool = False,
    tile_h: Optional[int] = None,
    interpret: bool = False,
):
    """Frame-streaming form of `fused_conv_tconv_padded` (same contract)."""
    h, w = hw
    hp, wp = padded_hw(h, w)
    b, frames = parts[0][0].shape[:2]
    d = parts[0][1].shape[-1]
    cins = [x.shape[-1] for x, *_ in parts]
    tp = tile_h or stream_band_rows(h, w, wp, cins, d)
    if not tp:
        raise ValueError("streaming mega-kernel not viable at this shape")
    if h % tp:
        raise ValueError(f"tile_h {tp} must divide H={h}")

    from jax._src.pallas import core as _pc

    E = _pc.Element
    dtype = parts[0][0].dtype

    def win_idx(bb, i, f):
        return (bb, jnp.minimum(f, frames - 1), i * tp, 0, 0)

    def out_idx(bb, i, f):
        return (bb, jnp.maximum(f - 1, 0), 1 + i * tp, 0, 0)

    in_specs = []
    args = []
    for x, kernel, a, b_ in parts:
        c = x.shape[-1]
        in_specs.append(
            pl.BlockSpec((E(1), E(1), E(tp + 2), E(wp), E(c)), win_idx)
        )
        args.append(x)
        in_specs.append(
            pl.BlockSpec((b * frames, c), lambda bb, i, f: (0, 0))
        )
        args.append(a.astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec((b * frames, c), lambda bb, i, f: (0, 0))
        )
        args.append(b_.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((9 * c, d), lambda bb, i, f: (0, 0)))
        args.append(kernel.astype(dtype).reshape(9 * c, d))
    in_specs.append(pl.BlockSpec((1, d), lambda bb, i, f: (0, 0)))
    args.append(kbias.reshape(1, d))
    in_specs.append(pl.BlockSpec((3 * d, d), lambda bb, i, f: (0, 0)))
    args.append(tkernel.reshape(3 * d, d).astype(dtype))
    in_specs.append(pl.BlockSpec((1, d), lambda bb, i, f: (0, 0)))
    args.append(tbias.reshape(1, d))
    if emb is not None:
        in_specs.append(pl.BlockSpec((b, d), lambda bb, i, f: (0, 0)))
        args.append(emb.reshape(b, d))
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((E(1), E(1), E(tp), E(wp), E(d)), out_idx)
        )
        args.append(residual)

    out_shapes = [jax.ShapeDtypeStruct((b, frames, hp, wp, d), dtype)]
    out_specs = [
        pl.BlockSpec((E(1), E(1), E(tp), E(wp), E(d)), out_idx)
    ]
    if want_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, frames, 2, d), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, frames, 2, d), lambda bb, i, f: (bb, 0, 0, 0))
        )

    outs = pl.pallas_call(
        functools.partial(
            _conv_tconv_stream_kernel, tp=tp, h=h, w=w, wp=wp,
            cins=tuple(cins), d=d, frames=frames, silu=silu,
            has_emb=emb is not None, has_res=residual is not None,
            want_stats=want_stats,
        ),
        grid=(b, h // tp, frames + 1),
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shapes if want_stats else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((3, tp, w, d), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(*args)
    return outs


# -- spatial 3x3 conv ---------------------------------------------------------


def _spatial3x3_kernel(
    xp_ref, w_ref, b_ref, o_ref, scratch, sem,
    *, th: int, w_out: int, wp: int, cin: int, cout: int,
):
    """One (image, row-tile) step: DMA the haloed (th+2, Wp, C) row band
    from HBM, build the two column-shifted variants with `pltpu.roll`
    (zero-padded borders make the cyclic wrap harmless on the first W
    output columns), then accumulate 9 CONTIGUOUS full-width matmuls in
    fp32 — no strided reshape copies."""
    n = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_ref.at[n, pl.ds(j * th, th + 2)], scratch, sem
    )
    dma.start()
    dma.wait()
    x0 = scratch[:]  # (th+2, Wp, C)
    # materialize the three column-shifted variants ONCE (Mosaic cannot
    # rotate bf16 vectors, and per-tap strided slices cost 9 copies)
    shifted = [x0[:, dj:dj + w_out, :] for dj in range(3)]
    acc = None
    for di in range(3):
        for dj in range(3):
            xs = shifted[dj][di:di + th].reshape(th * w_out, cin)
            part = jax.lax.dot_general(
                xs, w_ref[di, dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    y = acc + b_ref[0].astype(jnp.float32)[None, :]
    o_ref[0] = y.reshape(th, w_out, cout).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile_h")
)
def spatial_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    interpret: bool = False,
    tile_h: Optional[int] = None,
):
    """3x3 stride-1 SAME conv over a row-major image batch.

    x: (N, H, W, C) raw (the producer's write typically fuses the GroupNorm
    affine + SiLU); kernel (3, 3, C, D) flax layout; returns (N, H, W, D).
    Row-major in and out, so the fused ResBlock interior never leaves the
    default layout (the XLA conv emitter's {3,0,2,1} operand layout forces
    multi-ms relayout fusions at every Pallas boundary — PERF.md round 2
    trace). The width is zero-padded up to a sublane multiple so the
    haloed HBM row-band DMA stays tiling-aligned.
    """
    n, h, w, c = x.shape
    d = kernel.shape[-1]
    if kernel.shape[:3] != (3, 3, c):
        raise ValueError(f"kernel {kernel.shape} vs input C={c}")
    wp = ((w + 2 + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    hp = h + 2

    if tile_h is None:
        # keep the 3 shifted scratch copies + fp32 accumulator + weights
        # within a VMEM budget
        budget = 6 * 1024 * 1024
        tile_h = h
        while tile_h > 8 and tile_h * (w + 8) * (c * 6 + d * 4) > budget:
            tile_h //= 2
    while h % tile_h:
        tile_h //= 2
    n_tiles = h // tile_h

    return pl.pallas_call(
        functools.partial(
            _spatial3x3_kernel, th=tile_h, w_out=w, wp=wp, cin=c, cout=d,
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, c, d), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, c), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, kernel.astype(xp.dtype), bias.reshape(1, d))


# -- fused spatial attention on the padded stream (round 3) -------------------


def _attn_padded_kernel(
    x_ref, a_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    o_ref, stats_ref=None,
    *, hp, wp, h, w, n_heads, ch, want_stats,
):
    """One (batch*frame) sample of padded-stream spatial self-attention.

    Layout strategy (Mosaic limits, CLAUDE.md): QKV is computed TRANSPOSED
    — qkvT (3C, M) = dot(Wqkv^T-contraction, xn) — so the 32-wide per-head
    slices land on the 8-aligned SUBLANE dim (lane slices would need
    128-alignment). Logits/out use transposed-contraction dot_generals the
    MXU consumes natively. Pad tokens are masked out of the softmax with a
    lane-iota interior mask; outputs are zeroed at every pad position
    (stricter than the PaddedStream contract), which also makes the
    emitted per-frame sum/sumsq statistics exact interior statistics.
    """
    nn_ = pl.program_id(0)
    n = a_ref.shape[0]
    m = hp * wp
    c = n_heads * ch
    dtype = x_ref.dtype

    # per-sample collapsed GroupNorm affine via one-hot row select
    # (dynamic sublane indexing is not supported; the dot is free)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == nn_
    ).astype(jnp.float32)
    a_row = jax.lax.dot_general(
        sel, a_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    b_row = jax.lax.dot_general(
        sel, b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # interior mask over the M token positions. Two orientations, each
    # built directly from a broadcasted iota in its target shape: Mosaic
    # cannot reshape an i1 vector onto a new minor dim ("insertion of
    # minor dim that is not a no-op only supported for 32-bit types").
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    row = idx // wp
    col = idx - row * wp
    interior = (
        (row >= 1) & (row <= h) & (col >= 1) & (col <= w)
    )
    idx_m1 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    row_m1 = idx_m1 // wp
    col_m1 = idx_m1 - row_m1 * wp
    interior_m1 = (
        (row_m1 >= 1) & (row_m1 <= h) & (col_m1 >= 1) & (col_m1 <= w)
    )

    x = x_ref[0].reshape(m, c)  # (M, C) leading-dims merge
    # pad positions hold GARBAGE by the PaddedStream contract (the
    # stride-2 downconv producer never writes them — they can be NaN/Inf,
    # which additive masks and multiplicative zeroing do NOT remove), so
    # select them to zero before anything mixes tokens
    x = jnp.where(interior_m1, x, jnp.zeros_like(x))
    xn = (x.astype(jnp.float32) * a_row + b_row).astype(dtype)

    # qkvT (3C, M): contract C of Wqkv (C, 3C) with C of xn (M, C)
    qkvT = jax.lax.dot_general(
        wqkv_ref[:], xn, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)  # (3C, 1) broadcasts over lanes
    qkvT = qkvT.astype(dtype)

    neg = jnp.where(interior, 0.0, -1e30)  # (1, M) additive key mask

    scale = 1.0 / math.sqrt(math.sqrt(ch))
    outs = []
    for hd in range(n_heads):
        base = hd * 3 * ch
        q_t = qkvT[base:base + ch, :]             # (ch, M)
        k_t = qkvT[base + ch:base + 2 * ch, :]
        v_t = qkvT[base + 2 * ch:base + 3 * ch, :]
        # logits (M, M): contract the ch sublanes of both operands
        logits = jax.lax.dot_general(
            q_t, k_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * scale)
        logits = logits + neg  # mask pad KEYS
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - lmax)
        probs = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(dtype)
        # out_h (M, ch): contract probs' key dim with v_t's lane dim
        outs.append(jax.lax.dot_general(
            probs, v_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype))
    att = jnp.concatenate(outs, axis=-1)  # (M, C) head-major

    proj = jax.lax.dot_general(
        att, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)  # (1, C) broadcasts over sublanes

    y = x.astype(jnp.float32) + proj
    # select (not multiply): zero ALL pads even against non-finite proj
    y = jnp.where(interior_m1, y, jnp.zeros_like(y))
    o_ref[0] = y.reshape(hp, wp, c).astype(dtype)
    if want_stats:
        stats_ref[0, 0:1, :] = jnp.sum(y, axis=0, keepdims=True)
        stats_ref[0, 1:2, :] = jnp.sum(y * y, axis=0, keepdims=True)


def fused_spatial_attention_padded(
    x: jax.Array,
    hw: Tuple[int, int],
    a: jax.Array,
    b: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wproj: jax.Array,
    bproj: jax.Array,
    num_head_channels: int,
    want_stats: bool = False,
    interpret: bool = False,
):
    """Spatial self-attention (`unet.py:263-330` semantics: legacy
    reshape-then-split QKV head layout, 1/sqrt(sqrt(ch)) double scaling,
    fp32 softmax, raw-input residual) consuming AND producing the padded
    (N, Hp, Wp, C) stream in one kernel: the unpad/pad slices, the
    standalone GroupNorm pass, and the next block's full-tensor statistics
    read all disappear.

    Args:
      x: (N, Hp, Wp, C) padded stream (N = B*F folded).
      hw: interior (H, W).
      a, b: (N, C) fp32 collapsed GroupNorm affine (from
        `stats_to_group_affine` with n_per_channel = H*W).
      wqkv/bqkv: (C, 3C), (3C,); wproj/bproj: (C, C), (C,).
      want_stats: also return (N, 2, C) interior sum/sumsq of the OUTPUT,
        so the downstream ResBlock keeps its forwarded-stats fast path.
    Returns (N, Hp, Wp, C) with every pad position zeroed [, stats].
    """
    h, w = hw
    hp, wp = padded_hw(h, w)
    n, xp_h, xp_w, c = x.shape
    if (xp_h, xp_w) != (hp, wp):
        raise ValueError(f"x {x.shape} vs padded ({hp},{wp})")
    if c % num_head_channels:
        raise ValueError(f"C={c} not divisible by ch={num_head_channels}")
    n_heads = c // num_head_channels
    dtype = x.dtype

    out_shape = [jax.ShapeDtypeStruct((n, hp, wp, c), dtype)]
    out_specs = [pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0))]
    if want_stats:
        out_shape.append(jax.ShapeDtypeStruct((n, 2, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0)))

    res = pl.pallas_call(
        functools.partial(
            _attn_padded_kernel, hp=hp, wp=wp, h=h, w=w,
            n_heads=n_heads, ch=num_head_channels, want_stats=want_stats,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((3 * c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shape if want_stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(
        x,
        a.astype(jnp.float32),
        b.astype(jnp.float32),
        wqkv.astype(dtype),
        bqkv.reshape(3 * c, 1).astype(jnp.float32),
        wproj.astype(dtype),
        bproj.reshape(1, c).astype(jnp.float32),
    )
    return res if want_stats else (res, None)[0]


# -- Winograd F(2x2, 3x3) spatial conv (round 3) -------------------------------


def winograd_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, C, D) flax kernel -> the 16 transform-domain matrices
    (16, C, D): W_ab = (G g G^T)[a, b] per channel pair, G the standard
    F(2x2, 3x3) weight transform [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]].
    Computed in f32 OUTSIDE the kernel — inside a DDIM `lax.scan` chain the
    weights are loop-invariant, so XLA hoists this out of the loop."""
    g = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    k = kernel.astype(jnp.float32)  # (3, 3, C, D)
    # G @ k over the first spatial axis, then G @ . over the second
    t = jnp.einsum("ai,ijcd->ajcd", g, k)
    t = jnp.einsum("bj,ajcd->abcd", g, t)
    c, d = kernel.shape[2], kernel.shape[3]
    return t.reshape(16, c, d)


def _winograd_kernel(
    xp_ref, wt_ref, b_ref, o_ref, scratch, comp, sem,
    *, th: int, w_out: int, wp: int, cin: int, cout: int,
):
    """One (image, row-band) step of the Winograd F(2x2,3x3) conv.

    Pipeline per band (all in VMEM):
      1. DMA the haloed (th+2, Wp, C) row band from HBM (same halo
         convention as `_spatial3x3_kernel`).
      2. For each tile-row r (2 output rows each): Bt row combos in f32,
         then column combos via the f32 (Wp/2, 2, C) parity-split reshape
         (round-2c: (W,2)<->sublane merge/split works in f32) and a
         one-tile sublane shift; the 16 transform components land in a
         (16, th/2 * W/2, C) bf16 scratch.
      3. 16 dots (M, C) x (C, D) in the transform domain — 16/9 the dot
         count of the direct form but 4x smaller M, for 2.25x fewer MACs.
      4. Inverse transform A^T M A accumulated directly into 4 (M, D)
         output-parity buffers (+-1 coefficients only), then the f32
         parity-merge reshape interleaves columns and rows back.
    """
    n = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_ref.at[n, pl.ds(j * th, th + 2)], scratch, sem
    )
    dma.start()
    dma.wait()
    x0 = scratch[:]  # (th+2, Wp, C) bf16
    tr = th // 2
    wt_tiles = w_out // 2
    m = tr * wt_tiles

    # 2. transform components
    for r in range(tr):
        d0 = x0[2 * r].astype(jnp.float32)      # (Wp, C)
        d1 = x0[2 * r + 1].astype(jnp.float32)
        d2 = x0[2 * r + 2].astype(jnp.float32)
        d3 = x0[2 * r + 3].astype(jnp.float32)
        t_rows = (d0 - d2, d1 + d2, d2 - d1, d1 - d3)
        for a, t in enumerate(t_rows):
            # parity split: padded col 2j -> e[j], col 2j+1 -> o[j]
            sp = t.reshape(wp // 2, 2, cin)
            e = sp[:, 0, :]
            o = sp[:, 1, :]
            e1 = e[1:1 + wt_tiles]
            o1 = o[1:1 + wt_tiles]
            e, o = e[:wt_tiles], o[:wt_tiles]
            cols = (e - e1, o + e1, e1 - o, o - o1)
            for b, cmb in enumerate(cols):
                comp[4 * a + b, pl.ds(r * wt_tiles, wt_tiles)] = (
                    cmb.astype(comp.dtype)
                )

    # 3 + 4. transform-domain dots, inverse transform accumulated into the
    # four output parities (A^T rows [1,1,1,0] and [0,1,-1,-1])
    at = ((1.0, 1.0, 1.0, 0.0), (0.0, 1.0, -1.0, -1.0))
    y = [[None, None], [None, None]]
    for a in range(4):
        for b in range(4):
            needed = any(
                at[rr][a] != 0.0 and at[cc][b] != 0.0
                for rr in range(2) for cc in range(2)
            )
            if not needed:
                continue
            mab = jax.lax.dot_general(
                comp[4 * a + b], wt_ref[4 * a + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (M, D)
            for rr in range(2):
                for cc in range(2):
                    s = at[rr][a] * at[cc][b]
                    if s == 0.0:
                        continue
                    contrib = mab if s == 1.0 else -mab
                    y[rr][cc] = (
                        contrib if y[rr][cc] is None else y[rr][cc] + contrib
                    )

    bias = b_ref[0].astype(jnp.float32)[None, :]
    # interleave columns (f32 parity-merge reshape), then rows (leading dim)
    rows = []
    for rr in range(2):
        pair = jnp.concatenate(
            [
                (y[rr][0] + bias).reshape(m, 1, cout),
                (y[rr][1] + bias).reshape(m, 1, cout),
            ],
            axis=1,
        )  # (M, 2, D)
        rows.append(pair.reshape(tr, w_out, cout))
    both = jnp.concatenate(
        [rows[0].reshape(tr, 1, w_out, cout),
         rows[1].reshape(tr, 1, w_out, cout)],
        axis=1,
    )  # (tr, 2, W, D)
    o_ref[0] = both.reshape(th, w_out, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def winograd_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    interpret: bool = False,
    tile_h: Optional[int] = None,
):
    """3x3 stride-1 SAME conv via Winograd F(2x2,3x3), drop-in for
    `spatial_conv3x3` (same raw row-major interface). 2.25x fewer MXU MACs
    than the direct form; the input/inverse transforms ride the VPU in
    f32. Requires even H and W."""
    n, h, w, c = x.shape
    d = kernel.shape[-1]
    if kernel.shape[:3] != (3, 3, c):
        raise ValueError(f"kernel {kernel.shape} vs input C={c}")
    if h % 2 or w % 2:
        raise ValueError("winograd_conv3x3 needs even H and W")
    wp = ((w + 2 + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))

    if tile_h is None:
        budget = 8 * 1024 * 1024
        tile_h = h
        # working set: bf16 comp scratch (16 * th/2 * w/2 * c), f32 y
        # parities (4 * m * d), the haloed band, weights (16 c d bf16)
        while tile_h > 2 and (
            16 * (tile_h // 2) * (w // 2) * c * 2
            + 4 * (tile_h // 2) * (w // 2) * d * 4
            + (tile_h + 2) * wp * c * 2 * 2
        ) > budget:
            tile_h //= 2
    while h % tile_h or tile_h % 2:
        tile_h -= 2
    tile_h = max(tile_h, 2)
    n_tiles = h // tile_h

    wt = winograd_weights(kernel).astype(x.dtype)  # (16, C, D)
    m = (tile_h // 2) * (w // 2)

    return pl.pallas_call(
        functools.partial(
            _winograd_kernel, th=tile_h, w_out=w, wp=wp, cin=c, cout=d,
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, c, d), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, c), x.dtype),
            pltpu.VMEM((16, m, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(xp, wt, bias.reshape(1, d))


# -- wgrad of the (affine+SiLU+)3x3 conv (training backward, round 5) ---------
#
# dW[di,dj,ci,co] = sum_{n,h,w} s[n, h+di-1, w+dj-1, ci] * g[n, h, w, co]
# where s = silu(a*x + b) is the forward's conv operand, recomputed
# IN-KERNEL from the raw (pre-norm) input band — s never materializes in
# HBM, and the wgrad pays neither the {3,0,2,1} relayout of s nor of g
# that XLA's bwd conv forces (PERF.md round-5 tfused trace: the
# (f32[], bf16[3,3,C,D]) wgrad fusions and their operand relayouts are the
# largest remaining conv bucket).


def _wgrad3x3_kernel(
    *refs, th, h_out, w_out, cin, cout_blk, has_affine, silu,
):
    idx = 0
    x_ref = refs[idx]; idx += 1       # (1, th+2, Wp, Cin) Element band
    a_ref = b_ref = None
    if has_affine:
        a_ref = refs[idx]; idx += 1   # (N, Cin) float32, full
        b_ref = refs[idx]; idx += 1
    g_ref = refs[idx]; idx += 1       # (1, th, W, CoutBlk)
    o_ref = refs[idx]                 # (9*Cin, CoutBlk) fp32 accumulator

    n = pl.program_id(1)
    i = pl.program_id(2)

    x = x_ref[0]  # (th+2, Wp, Cin)
    hp_rows = x.shape[0]
    wp = x.shape[1]
    xf = x.astype(jnp.float32)
    if has_affine:
        n_rows = a_ref.shape[0]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1) == n
        ).astype(jnp.float32)
        a = jax.lax.dot_general(
            sel, a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Cin)
        bsh = jax.lax.dot_general(
            sel, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xf = xf * a[0][None, None, :] + bsh[0][None, None, :]
        if silu:
            xf = xf * jax.nn.sigmoid(xf)
        # the affine turns the zero padding into silu(b) != 0 — re-zero
        # (global padded row in [1, H], col in [1, W])
        rr = (
            jax.lax.broadcasted_iota(jnp.int32, (hp_rows, wp, 1), 0)
            + i * th
        )
        cc = jax.lax.broadcasted_iota(jnp.int32, (hp_rows, wp, 1), 1)
        keep = (rr >= 1) & (rr <= h_out) & (cc >= 1) & (cc <= w_out)
        xf = jnp.where(keep, xf, 0.0)
    xb = xf.astype(x_ref.dtype)

    g = g_ref[0].reshape(th * w_out, cout_blk)

    @pl.when(jnp.logical_and(n == 0, i == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    for dj in range(3):
        sh = xb[:, dj:dj + w_out, :]  # (th+2, W, Cin) — one shift copy
        for di in range(3):
            t = di * 3 + dj
            xs = sh[di:di + th].reshape(th * w_out, cin)
            part = jax.lax.dot_general(
                xs, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Cin, CoutBlk)
            o_ref[t * cin:(t + 1) * cin] = (
                o_ref[t * cin:(t + 1) * cin] + part
            )


def wgrad_band_rows(h: int, w: int, c: int, d_blk: int,
                    budget_bytes: int = 11 * 1024 * 1024) -> int:
    """Rows per band: x band (bf16 + f32 affine temp) + 3 shifts + g band
    + the fp32 (9C, Dblk) accumulator + double-buffered IO within budget."""
    wp = ((w + 2 + 7) // 8) * 8
    acc = 9 * c * d_blk * 4
    th = h

    def cost(t):
        x_band = (t + 2) * wp * c * (2 + 4)      # bf16 + f32 temp
        shifts = 3 * (t + 2) * w * c * 2
        g_band = t * w * d_blk * 2
        io = 2 * ((t + 2) * wp * c * 2 + t * w * d_blk * 2)
        return acc + x_band + shifts + g_band + io

    while th > 8 and cost(th) > budget_bytes:
        th //= 2
    while h % th:
        th //= 2
    return max(th, 1)


@functools.partial(
    jax.jit,
    static_argnames=("silu", "interpret", "cout_blk", "tile_h"),
)
def wgrad_conv3x3(
    x: jax.Array,
    g: jax.Array,
    a: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    silu: bool = False,
    cout_blk: Optional[int] = None,
    tile_h: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """dW of y = conv3x3_same(silu(a*x + b)) w.r.t. the (3, 3, C, D) kernel.

    x: (N, H, W, C) raw pre-norm input; g: (N, H, W, D) output cotangent;
    a, b: optional (N, C) float32 affine (None = plain conv wgrad).
    Returns (3, 3, C, D) float32. Same 128-multiple channel eligibility as
    `fused_affine_conv3x3`.
    """
    n, h, w, c = x.shape
    d = g.shape[-1]
    if g.shape[:3] != (n, h, w):
        raise ValueError(f"g {g.shape} vs x {x.shape}")
    if silu and a is None:
        # the in-kernel SiLU recompute lives inside the affine branch; a
        # silu-without-affine call would silently return the plain-conv
        # wgrad (the gradient of the wrong function)
        raise NotImplementedError(
            "wgrad_conv3x3: silu=True requires the (a, b) affine; pass "
            "a=ones, b=zeros for a bare-SiLU operand")
    wp = ((w + 2 + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    has_affine = a is not None

    if cout_blk is None:
        cout_blk = d if d <= 256 else 128
    if d % cout_blk:
        raise ValueError(f"cout_blk {cout_blk} must divide D={d}")
    th = tile_h or wgrad_band_rows(h, w, c, cout_blk)
    if h % th:
        raise ValueError(f"tile_h {th} must divide H={h}")

    from jax._src.pallas import core as _pc

    E = _pc.Element
    in_specs = [
        pl.BlockSpec(
            (E(1), E(th + 2), E(wp), E(c)),
            lambda j, nn, i: (nn, i * th, 0, 0),
        )
    ]
    args = [xp]
    if has_affine:
        in_specs.append(pl.BlockSpec((n, c), lambda j, nn, i: (0, 0)))
        in_specs.append(pl.BlockSpec((n, c), lambda j, nn, i: (0, 0)))
        args += [a.astype(jnp.float32), b.astype(jnp.float32)]
    in_specs.append(
        pl.BlockSpec((1, th, w, cout_blk), lambda j, nn, i: (nn, i, 0, j))
    )
    args.append(g)

    out = pl.pallas_call(
        functools.partial(
            _wgrad3x3_kernel, th=th, h_out=h, w_out=w, cin=c,
            cout_blk=cout_blk, has_affine=has_affine, silu=silu,
        ),
        grid=(d // cout_blk, n, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((9 * c, cout_blk), lambda j, nn, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((9 * c, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # j indexes disjoint output blocks (parallel); the accumulation
            # runs across nn and i, which must stay sequential per block
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(3, 3, c, d)
