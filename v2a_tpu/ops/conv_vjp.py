"""Differentiable fused affine+SiLU+conv3x3 — the TRAINING-path counterpart
of the inference `fused_affine_conv3x3` routing (PERF.md rounds 2/5).

The round-5 trace of the video train step (PERF.md "Round 5: video TRAINING
step attribution") shows the plain-XLA training path pays (a) the conv
emitter's {3,0,2,1} operand layout — 49 ms/step of pure relayout copies at
B=4 — and (b) a materialized GroupNorm+SiLU activation per conv.  The
inference path eliminated both with the Pallas row-major fused kernel; this
module makes that kernel differentiable so the forward half of the train
step gets the same treatment:

  fwd:  `fused_affine_conv3x3(x, W, bias, a, b, silu=True)` — one Pallas
        pass, row-major in/out, the collapsed GroupNorm affine + SiLU
        applied in VMEM (the normed tensor never hits HBM).
  bwd:  recompute the elementwise front (z = a*x+b, s = silu(z) — cheap,
        XLA fuses it into the consumers) and differentiate the conv:
        dgrad optionally through the SAME Pallas kernel in plain-conv mode
        (spatially flipped, channel-transposed weights — a stride-1 SAME
        3x3 conv's input gradient is itself a stride-1 SAME 3x3 conv), and
        wgrad through XLA's bwd conv.

Gradient math (y = conv3x3_same(silu(a.x + b), W) + bias):
  ds      = conv3x3_same(g, rot180(W)^T)
  dz      = ds * silu'(z),  silu'(z) = sig(z) * (1 + z * (1 - sig(z)))
  dx      = a * dz
  da, db  = sum_{H,W} dz * x,  sum_{H,W} dz          (per (N, C))
  dW      = wgrad(s, g)  [XLA bwd conv]
  dbias   = sum_{N,H,W} g

The affine (a, b) is per-(N, C) float32 — the per-sample GroupNorm collapse
from `stats_to_group_affine`; its VJP flows back through the stats to x and
the GN scale/bias outside this function, so the full GroupNorm gradient
(including the mean/var terms) is produced by ordinary autodiff around this
custom_vjp.

Reference behavior being trained: GN->SiLU->conv ResBlock halves of
`/root/reference/flowdiffusion/flowdiffusion/guided_diffusion/unet.py:148-261`,
trained by `.../guided_diffusion/train_util.py:22-301`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from v2a_tpu.ops.resblock_kernels import fused_affine_conv3x3

_DIMNUM = ("NHWC", "HWIO", "NHWC")


def _silu_fwd_bwd(x, a, b):
    """z, s=silu(z), silu'(z) in float32 from the saved raw input."""
    xf = x.astype(jnp.float32)
    z = xf * a[:, None, None, :] + b[:, None, None, :]
    sig = jax.nn.sigmoid(z)
    s = z * sig
    sprime = sig * (1.0 + z * (1.0 - sig))
    return xf, z, s, sprime


def _conv_fwd_xla(s_op, kernel):
    return lax.conv_general_dilated(
        s_op, kernel.astype(s_op.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_DIMNUM,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def affine_silu_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    a: jax.Array,
    b: jax.Array,
    dgrad_pallas: bool = True,
    interpret: bool = False,
    wgrad_pallas: bool = False,
) -> jax.Array:
    """y = conv3x3_same(silu(a*x + b), kernel) + bias, Pallas forward.

    x: (N, H, W, C); kernel: (3, 3, C, D) float32 param; bias: (D,);
    a, b: (N, C) float32 per-sample channel affine. Returns (N, H, W, D)
    in x.dtype. Eligibility (C, D multiples of 128, H*W within the VMEM
    gate) is the caller's job — same `_spatial2_eligible` gate as the
    inference routing.
    """
    return fused_affine_conv3x3(
        x, kernel, bias, a=a, b=b, silu=True, interpret=interpret
    )


def _fwd(x, kernel, bias, a, b, dgrad_pallas, interpret, wgrad_pallas):
    y = fused_affine_conv3x3(
        x, kernel, bias, a=a, b=b, silu=True, interpret=interpret
    )
    return y, (x, kernel, a, b)


def _bwd(dgrad_pallas, interpret, wgrad_pallas, res, g):
    x, kernel, a, b = res
    xf, z, s, sprime = _silu_fwd_bwd(x, a, b)
    s_op = s.astype(x.dtype)  # the forward's effective conv operand

    if wgrad_pallas:
        # wgrad through the Pallas band kernel: recomputes silu(a*x+b)
        # IN-KERNEL from the raw input band (s never hits HBM for this
        # consumer, and neither operand pays the {3,0,2,1} relayout).
        from v2a_tpu.ops.resblock_kernels import wgrad_conv3x3

        dkernel = wgrad_conv3x3(
            x, g, a=a, b=b, silu=True, interpret=interpret,
        )
    if dgrad_pallas:
        # dgrad is itself a stride-1 SAME 3x3 conv: flip taps, swap in/out
        # channels — run it through the same row-major Pallas kernel
        # (plain-conv mode) so the backward conv pays no relayouts either.
        wt = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # (3, 3, D, C)
        c = kernel.shape[2]
        ds = fused_affine_conv3x3(
            g, wt, jnp.zeros((c,), kernel.dtype), interpret=interpret
        )
        if not wgrad_pallas:
            # wgrad via XLA's bwd conv (output is the tiny (3,3,C,D) tensor)
            _, wgrad = jax.vjp(
                lambda k_: _conv_fwd_xla(s_op, k_), kernel
            )
            (dkernel,) = wgrad(g.astype(s_op.dtype))
    else:
        _, conv_vjp = jax.vjp(_conv_fwd_xla, s_op, kernel)
        ds, dkernel_xla = conv_vjp(g.astype(s_op.dtype))
        if not wgrad_pallas:
            dkernel = dkernel_xla

    dz = ds.astype(jnp.float32) * sprime
    dx = (dz * a[:, None, None, :]).astype(x.dtype)
    da = jnp.sum(dz * xf, axis=(1, 2)).astype(a.dtype)
    db = jnp.sum(dz, axis=(1, 2)).astype(b.dtype)
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(jnp.float32)
    return (
        dx,
        dkernel.astype(kernel.dtype),
        dbias.astype(jnp.float32),
        da,
        db,
    )


affine_silu_conv3x3.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def plain_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    dgrad_pallas: bool = True,
    interpret: bool = False,
    wgrad_pallas: bool = False,
) -> jax.Array:
    """y = conv3x3_same(x, kernel) + bias with the Pallas row-major kernel
    in forward and (optionally) dgrad — the no-affine variant for convs
    with no preceding norm (the Upsample3D conv, whose {3,0,2,1} relayout
    copies at 256ch/128² are the largest single remaining copies in the
    round-5 tfused trace). Same eligibility gate as the affine form."""
    return fused_affine_conv3x3(x, kernel, bias, interpret=interpret)


def _plain_fwd(x, kernel, bias, dgrad_pallas, interpret, wgrad_pallas):
    y = fused_affine_conv3x3(x, kernel, bias, interpret=interpret)
    return y, (x, kernel)


def _plain_bwd(dgrad_pallas, interpret, wgrad_pallas, res, g):
    x, kernel = res
    if wgrad_pallas:
        from v2a_tpu.ops.resblock_kernels import wgrad_conv3x3

        dkernel = wgrad_conv3x3(x, g, interpret=interpret)
    if dgrad_pallas:
        wt = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # (3, 3, D, C)
        c = kernel.shape[2]
        dx = fused_affine_conv3x3(
            g, wt, jnp.zeros((c,), kernel.dtype), interpret=interpret
        )
        if not wgrad_pallas:
            _, wgrad = jax.vjp(lambda k_: _conv_fwd_xla(x, k_), kernel)
            (dkernel,) = wgrad(g.astype(x.dtype))
    else:
        _, conv_vjp = jax.vjp(_conv_fwd_xla, x, kernel)
        dx, dkernel_xla = conv_vjp(g.astype(x.dtype))
        if not wgrad_pallas:
            dkernel = dkernel_xla
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx.astype(x.dtype), dkernel.astype(kernel.dtype), dbias


plain_conv3x3.defvjp(_plain_fwd, _plain_bwd)


def affine_silu_conv3x3_reference(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    a: jax.Array,
    b: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Plain-XLA reference of the same composite (for grad-equality tests):
    matches the training path's dtype discipline (f32 affine+SiLU, operand
    cast to the compute dtype for the conv)."""
    dt = compute_dtype or x.dtype
    xf = x.astype(jnp.float32)
    z = xf * a[:, None, None, :] + b[:, None, None, :]
    s = (z * jax.nn.sigmoid(z)).astype(dt)
    y = lax.conv_general_dilated(
        s, kernel.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_DIMNUM,
    )
    return y + bias.astype(dt)
