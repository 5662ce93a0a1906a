"""3D video diffusion U-Net (Flax, channels-last).

TPU-native re-design of the guided-diffusion `UNetModel` as configured by
`Unet_Libero` (`flowdiffusion/flowdiffusion/unet.py:195-222`,
`flowdiffusion/flowdiffusion/guided_diffusion/guided_diffusion/unet.py:
404-684`): model_channels=128, channel_mult (1,2,3,4,5), 2 res blocks per
level, spatial attention at downsample rates 8 and 16, head width 32,
factorized pseudo-3D convolutions, Perceiver-pooled CLIP text conditioning.

Layout and precision:
- activations are (B, F, H, W, C) — frames-major channels-last, the native
  XLA:TPU conv layout; per-frame spatial convs fold F into the batch,
- temporal mixing is a 3-tap identity-initialized conv over F applied at
  every pseudo-3D conv (`.../guided_diffusion/nn.py:30-88`; note the
  reference pads symmetrically, so despite its comment the conv is NOT
  causal — reproduced faithfully),
- GroupNorm(32) and softmax run in float32; conv/matmul compute dtype is
  configurable (bf16 on TPU) matching the reference's GroupNorm32 discipline
  (`nn.py:26-28`),
- attention uses the "legacy" head-major QKV layout semantics
  (`unet.py:332-368`) with the 1/sqrt(sqrt(d)) two-sided scaling.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2a_tpu.models.perceiver import PerceiverResampler

# Trace-time ablation switches for `scripts/perf_lab.py` ONLY — they change
# the parameter tree and must stay False in production/tests. They exist so
# the perf lab can attribute forward-pass time to temporal convs / GroupNorm
# without forking the model definition.
PERF_ABLATE_TEMPORAL = False
PERF_ABLATE_GN = False
# Express 3x3 stride-1 spatial convs as explicit im2col matmuls. Rationale:
# XLA's conv emitter picks an N-second-minor operand layout ({3,0,2,1}),
# forcing multi-ms relayout fusions at every Pallas-kernel boundary in the
# fused path (trace, PERF.md round 2); dots keep the default row-major
# layout end-to-end. Trace-time switch exercised by scripts/perf_lab.py.
# MEASURED: loses badly (682 ms vs 196) — the 9x patch materialization
# swamps the relayout savings; kept for the record.
PERF_SPATIAL_IM2COL = False
# Run the fused temporal conv on the (H*W, B, F, C) view, byte-identical to
# the convs' preferred layout, so boundary transposes become bitcasts.
# MEASURED: XLA materializes the transposes instead (347 ms vs 196) — off.
PERF_TCONV_HW = False
# Only fuse pseudo-convs with at least this many features: boundary
# relayout cost scales with tensor size, so restricting fusion to deeper
# levels can net-win. 0 = fuse everywhere.
PERF_FUSED_MIN_CH = 0
# In the fused path, never materialize the up-path skip concatenation:
# conv(concat(h, skip)) = conv(h, W[:Ch]) + conv(skip, W[Ch:]), and the
# GroupNorm affine splits per part — XLA implements big concats as async
# HBM copy chains (the round-2 trace's 100 ms slice/copy tail).
PERF_SPLIT_SKIP = True
# Run 3x3 stride-1 spatial convs through the Pallas row-major kernel
# (ops/resblock_kernels.py::spatial_conv3x3) so the whole fused ResBlock
# interior stays in ONE layout (no {3,0,2,1} relayout fusions).
PERF_PALLAS_SPATIAL = False
# In the TRAIN-fused path (`train_fused`), run the backward input-gradient
# conv through the same Pallas row-major kernel (plain-conv mode, flipped
# weights) instead of XLA's bwd conv — see ops/conv_vjp.py.
PERF_TRAIN_DGRAD_PALLAS = os.environ.get("V2A_TRAIN_DGRAD_PALLAS", "1") == "1"
# ... and the weight-gradient through the Pallas band-accumulation kernel
# (`wgrad_conv3x3` — recomputes the affine+SiLU in-kernel so neither conv
# operand materializes in, nor relayouts through, HBM).
PERF_TRAIN_WGRAD_PALLAS = os.environ.get("V2A_TRAIN_WGRAD_PALLAS", "0") == "1"
# Min folded spatial size (H*W) for the Pallas wgrad routing: the relayout
# copies it saves scale with the activation footprint, so the win lives at
# the wide shallow levels; scoping it also bounds the count of distinct
# Mosaic kernels per program (the remote compile helper dies on very large
# programs — the levels-remat failure class, CLAUDE.md round 4).
PERF_TRAIN_WGRAD_MIN_S = int(os.environ.get("V2A_TRAIN_WGRAD_MIN_S", "0"))
# In the train-fused path, express the temporal conv as k tap DOTS on the
# row-major (B, F, H, W, C) tensor (zero-pad F, shift, (C,D) matmul per
# tap) instead of the transpose+conv1d form: no frame transposes fwd or
# bwd, no conv emitter — autodiff gives tap-dot gradients that stay
# row-major next to the Pallas conv kernels. Param tree identical.
PERF_TRAIN_TCONV_DOT = os.environ.get("V2A_TRAIN_TCONV_DOT", "0") == "1"
# Express the fused temporal conv as an XLA 2D convolution with a (k, 1)
# kernel over the (B, F, H*W, C) view. Every op in the ResBlock is then an
# XLA conv sharing the {3,0,2,1} operand layout — no Pallas boundary, no
# relayout fusions — while the bias/emb/residual adds and the GroupNorm
# statistics stay fused as conv epilogues. Applied when the folded spatial
# size H*W >= PERF_TCONV_XLA2D_MIN_S (0 disables; 1 = everywhere).
PERF_TCONV_XLA2D_MIN_S = 0
# Deep-level Pallas conv: run 3x3 stride-1 spatial convs with features >=
# this threshold (and H*W <= 512, i.e. the 16^2/8^2 levels) through
# `ops/resblock_kernels.py::fused_affine_conv3x3` — an in-VMEM im2col
# matmul with the preceding GroupNorm affine + SiLU applied on the fly.
# Rationale: XLA's conv emitter runs those levels at 61/29 TFLOP/s vs the
# 117 chip peak (PERF.md cost model), and every XLA conv adjacent to a
# Pallas temporal kernel pays boundary relayout fusions. 0 = off.
# Default 512 (L3+L4) measured -3.3 ms/fwd on-chip (PERF.md round 2);
# engages only in the fused (inference) path.
PERF_PALLAS_SPATIAL2_MIN_CH = int(os.environ.get("V2A_SPATIAL2_MIN_CH", "128"))
# Max folded spatial size routed through the kernel. 512 = whole-frame
# im2col path only (L3/L4); 16384 also sends the banded (halo'd row-band)
# variant the L0-L2 convs. Defaults measured on-chip (PERF.md round 2b):
# all-level 184.8 ms/fwd vs 185.3 (deep-only) vs 192.2 (none).
PERF_PALLAS_SPATIAL2_MAX_S = int(os.environ.get("V2A_SPATIAL2_MAX_S", "16384"))
# Express 1x1 convs (ResBlock skip projections) as plain dots: a matmul on
# (N*H*W, C) keeps the default row-major layout instead of inheriting the
# conv emitter's {3,0,2,1} operand layout. Exact-equal math; measured
# -3.9 ms/fwd on-chip (PERF.md round 2).
PERF_SKIP1X1_DOT = os.environ.get("V2A_SKIP1X1_DOT", "1") == "1"
# Padded-stream layout: at the banded levels (L0-L2) activations stay in
# (B, F, Hp, Wp, C) padded form for the whole level, so the per-conv
# `jnp.pad` HBM pass (15.5 ms/fwd in the round-2 trace) disappears — the
# conv kernel reads the pre-padded stream and writes a padded output with
# zeroed borders. Only the fused (inference) path. Measured -8 ms/fwd
# (163.5 vs 171.5, PERF.md round 2c); on by default.
PERF_PADDED_STREAM = os.environ.get("V2A_PADDED_STREAM", "1") == "1"
# Fuse each padded PseudoConv3d's spatial conv + temporal conv into ONE
# Pallas kernel (all F frames of a row band in VMEM): the intermediate
# conv activation never round-trips HBM. Requires PERF_PADDED_STREAM.
# Measured 155.3 vs 158.7 ms/fwd (PERF.md round 2c); on by default.
PERF_MEGA_KERNEL = os.environ.get("V2A_MEGA_KERNEL", "1") == "1"
# Upsample convs as the collapsed 4-parity low-res conv
# (`fused_upconv3x3_padded`): 44% of the FLOPs and the 2x-upsampled
# activation never exists in HBM. Requires PERF_PADDED_STREAM.
# Measured 143.8 vs 154.0 ms/fwd (PERF.md round 2c); on by default.
PERF_UPCONV = os.environ.get("V2A_UPCONV", "1") == "1"
# Frame-streaming form of the mega-kernel (frame axis on the grid, 3-slot
# conv-output ring in persistent scratch): one frame's window in VMEM at
# a time, so bands grow 4x and the conv dots hit full MXU tiles.
PERF_STREAM_KERNEL = os.environ.get("V2A_STREAM_KERNEL", "0") == "1"
# Downsample convs as the padded-stream stride-2 kernel
# (`fused_downconv3x3_padded`): the unpad slice, XLA strided-conv
# relayouts, and the next level's pad_stream pass all disappear.
PERF_DOWNCONV = os.environ.get("V2A_DOWNCONV", "0") == "1"
# Run the entry conv (in_channels -> model_channels) through the padded
# machinery: pad_stream the tiny 6-channel input (0.03 ms) and the XLA
# entry conv's {3,0,2,1} relayout copy + the L0 entry pad both vanish.
PERF_ENTRY_PAD = os.environ.get("V2A_ENTRY_PAD", "0") == "1"
# Spatial attention as ONE Pallas kernel on the padded stream
# (`fused_spatial_attention_padded`): the GroupNorm pass and the next
# block's full-tensor statistics read disappear. Default OFF: measured
# −4.6 ms/fwd LOSS in-chain (11.47 vs 11.02 s/iter, bench.py medians,
# PERF.md round 3) — the grid-sequential per-(b,f) samples and skinny
# ch=32 per-head dots pay MXU fill/drain that XLA's batched matmuls
# amortize across the whole (B*F*heads) batch, and the padded 432-token
# M inflates the logits 2.85x over the 256 real tokens. (The earlier
# "-2.7 ms, default on" record compared two identical programs: the
# attention levels are never padded, so the kernel was a silent no-op
# until the unpadded entry landed.)
PERF_PALLAS_ATTN = os.environ.get("V2A_PALLAS_ATTN", "0") == "1"
# XLA attention with the head axis transposed ONCE on the fused qkv
# tensor (and once back on the output) instead of the per-operand
# head-major relayouts the legacy einsum forms make XLA insert. The
# attention blocks are FLOP-trivial (~30 GFLOP/fwd); their measured
# 4.78 ms/fwd chain cost (PERF.md round-3 ablation) is mostly layout
# glue, which this targets. Same math, same param tree.
PERF_ATTN_HMAJOR = os.environ.get("V2A_ATTN_HMAJOR", "0") == "1"


class PaddedStream:
    """A (B, F, Hp, Wp, C) activation tensor in the padded-stream layout
    (interior at rows 1..H, cols 1..W; `ops/resblock_kernels.py::padded_hw`).
    Layout contract: pad COLS are zero FOR CONV/TCONV PRODUCERS (the
    padded 1x1-as-dot producer leaves its bias in the pad cols; its only
    consumer, the temporal conv residual path, masks in-kernel); pad ROWS
    (0 and Hp-1) are arbitrary garbage — every consumer (the conv
    kernel's interior mask, the temporal conv's row-skipping blocks,
    `unpad_stream`) masks or never reads them, which is what lets
    producers skip writing them."""

    __slots__ = ("x", "hw")

    def __init__(self, x: jax.Array, hw: Tuple[int, int]):
        self.x = x
        self.hw = hw


def pad_stream(h: jax.Array) -> PaddedStream:
    """(B, F, H, W, C) -> PaddedStream with zero pads."""
    from v2a_tpu.ops.resblock_kernels import padded_hw

    b, f, hh, ww, c = h.shape
    hp, wp = padded_hw(hh, ww)
    x = jnp.pad(h, ((0, 0), (0, 0), (1, hp - hh - 1), (1, wp - ww - 1), (0, 0)))
    return PaddedStream(x, (hh, ww))


def unpad_stream(ps: PaddedStream) -> jax.Array:
    hh, ww = ps.hw
    return ps.x[:, :, 1:hh + 1, 1:ww + 1, :]


def _padded_eligible(features: int, cins, hw: int) -> bool:
    """Gate for the padded-stream layout: the banded-conv levels."""
    return (
        PERF_PADDED_STREAM
        and _spatial2_eligible(features, cins, hw, 3, (1, 1))
        and hw > 512
    )


def _spatial2_eligible(features: int, cins, hw: int, k: int, strides) -> bool:
    """Shape gate for the deep-level Pallas conv (see flag above)."""
    if not PERF_PALLAS_SPATIAL2_MIN_CH or k != 3 or strides != (1, 1):
        return False
    if features % 128 or features < PERF_PALLAS_SPATIAL2_MIN_CH:
        return False
    if hw > PERF_PALLAS_SPATIAL2_MAX_S:
        return False
    return all(c % 128 == 0 for c in cins)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """[cos | sin] ordering with `arange(half)/half` frequencies
    (`.../guided_diffusion/nn.py:171-189`)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 statistics (`nn.py:26-28,160-167`).

    `use_pallas` routes through the fused Pallas kernel
    (`ops/pallas_kernels.py`): bf16 in/out in HBM, fp32 stats on-chip, and
    the optional SiLU fused into the same write. Parameter layout (scale,
    bias) is identical either way, so checkpoints are backend-agnostic.
    """

    num_groups: int = 32
    with_silu: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        stats: Optional[jax.Array] = None,
        return_affine: bool = False,
    ):
        c = x.shape[-1]
        if c % self.num_groups:
            raise ValueError(
                f"channels {c} not divisible by groups {self.num_groups}"
            )
        if PERF_ABLATE_GN:  # perf-lab attribution only
            return nn.silu(x) if self.with_silu else x
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if return_affine:
            # hand back the collapsed per-(B, C) scale/shift instead of
            # applying it — the deep-level Pallas conv kernel applies the
            # affine (+SiLU) on the fly (`ops/resblock_kernels.py::
            # fused_affine_conv3x3`), so the normed tensor never hits HBM
            from v2a_tpu.ops.resblock_kernels import stats_to_group_affine

            if stats is None:
                xf = x.astype(jnp.float32).reshape(x.shape[0], -1, c)
                st = jnp.stack(
                    [xf.sum(axis=1), (xf * xf).sum(axis=1)], axis=1
                )
            else:
                st = stats
            n_per_channel = 1
            for d in x.shape[1:-1]:
                n_per_channel *= d
            return stats_to_group_affine(
                st, scale, bias, n_per_channel, self.num_groups
            )
        if stats is not None:
            # (B, 2, C) per-channel sum/sumsq forwarded from the Pallas
            # temporal-conv kernel that produced x — the full-tensor
            # statistics read is skipped and GroupNorm collapses to a
            # per-(B, C) affine that XLA fuses into the consumer.
            from v2a_tpu.ops.resblock_kernels import stats_to_group_affine

            n_per_channel = 1
            for d in x.shape[1:-1]:
                n_per_channel *= d
            a, bshift = stats_to_group_affine(
                stats, scale, bias, n_per_channel, self.num_groups
            )
            bc = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            y = x.astype(jnp.float32) * a.reshape(bc) + bshift.reshape(bc)
            return nn.silu(y) if self.with_silu else y
        if self.use_pallas:
            from v2a_tpu.ops.pallas_kernels import fused_group_norm_silu

            return fused_group_norm_silu(
                x, scale, bias, self.num_groups, with_silu=self.with_silu,
                interpret=jax.default_backend() == "cpu",
            )
        # XLA path: group reductions as (C, G) one-hot matmuls so the
        # trailing dim stays C — the naive reshape(b, -1, g, c//g) forces
        # layout copies of the full fp32 tensor (940 MB at level 0; found
        # via xplane trace, see PERF.md)
        b = x.shape[0]
        g = self.num_groups
        gw = c // g
        xf = x.astype(jnp.float32).reshape(b, -1, c)
        s = xf.shape[1]
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
        m = (ch // gw == gr).astype(jnp.float32)
        sum_g = jnp.einsum("bsc,cg->bg", xf, m)
        sumsq_g = jnp.einsum("bsc,cg->bg", xf * xf, m)
        n = float(s * gw)
        mean_g = sum_g / n
        var_g = jnp.maximum(sumsq_g / n - mean_g * mean_g, 0.0)
        rstd_g = jax.lax.rsqrt(var_g + 1e-5)
        mean_c = jnp.einsum("bg,cg->bc", mean_g, m)[:, None, :]
        rstd_c = jnp.einsum("bg,cg->bc", rstd_g, m)[:, None, :]
        y = (xf - mean_c) * rstd_c * scale + bias
        if self.with_silu:
            y = nn.silu(y)
        return y.reshape(x.shape)


class _Conv2DParams(nn.Module):
    """Parameter container matching nn.Conv's {kernel, bias} layout for the
    explicit im2col spatial-conv formulation."""

    features: int
    kernel_size: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel_init = (
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", kernel_init, (k, k, in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _im2col_conv(y: jax.Array, kernel: jax.Array, bias: jax.Array,
                 dtype) -> jax.Array:
    """3x3 stride-1 SAME conv as one (N*H*W, 9C) x (9C, D) matmul on the
    default row-major layout."""
    n, h, w, c = y.shape
    k = kernel.shape[0]
    pad = k // 2
    xp = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = [
        jax.lax.slice(xp, (0, i, j, 0), (n, i + h, j + w, c))
        for i in range(k) for j in range(k)
    ]
    cat = jnp.concatenate(cols, axis=-1).reshape(n * h * w, k * k * c)
    d = kernel.shape[-1]
    out = jax.lax.dot_general(
        cat.astype(dtype), kernel.reshape(k * k * c, d).astype(dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    )
    return (out + bias.astype(dtype)).reshape(n, h, w, d)


def _tconv_conv2d(y, kernel, bias, emb, residual, want_stats, dtype):
    """Temporal 3-tap conv (`.../guided_diffusion/nn.py:30-88`) as an XLA 2D
    convolution with a (k, 1) kernel over the (B, F, H*W, C) view.

    Rationale (PERF.md round 2): the Pallas in-layout kernel matches the
    transpose+conv1d form per-op, but every Pallas call in a conv network
    pays {3,2,1,0} <-> {3,0,2,1} relayout fusions at its boundaries (~29 ms
    per U-Net forward). Expressed as a conv, the temporal mix shares the
    spatial convs' operand layout end-to-end, while the bias / timestep-
    embedding / residual adds and the downstream GroupNorm's sum/sumsq
    statistics remain reduction/elementwise epilogues that XLA fuses into
    the conv output. Parameter layout is `_TemporalConvParams`' (k, C, C).
    """
    b, f = y.shape[0], y.shape[1]
    c = y.shape[-1]
    orig_shape = y.shape
    s = 1
    for d in y.shape[2:-1]:
        s *= d
    k = kernel.shape[0]
    t = y.reshape(b, f, s, c)
    out = jax.lax.conv_general_dilated(
        t.astype(dtype), kernel.reshape(k, 1, c, c).astype(dtype),
        (1, 1), [(k // 2, k // 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + bias.astype(dtype)
    if emb is not None:
        out = out + emb.reshape(b, 1, 1, c).astype(dtype)
    if residual is not None:
        res = jnp.broadcast_to(residual, orig_shape).astype(dtype)
        out = out + res.reshape(b, f, s, c)
    y5 = out.reshape(orig_shape)
    if want_stats:
        of = out.astype(jnp.float32)
        stats = jnp.stack([of.sum(axis=2), (of * of).sum(axis=2)], axis=2)
        return y5, stats
    return y5


class _SkipConvParams(nn.Module):
    """Parameter container matching PseudoConv3d(name='skip_conv')'s
    {spatial_conv: {kernel, bias}} tree, for the in-kernel skip fold."""

    features: int

    @nn.compact
    def __call__(self, cin):
        return _Conv2DParams(self.features, 1, name="spatial_conv")(cin)


class _NormParams(nn.Module):
    """Parameter container matching GroupNorm32's {scale, bias} layout, for
    the split-skip affine application."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's {kernel, bias} layout, for
    the fused attention kernel."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _TemporalConvParams(nn.Module):
    """Parameter container matching nn.Conv's {kernel, bias} layout so the
    fused Pallas path shares checkpoints with the transpose+conv1d path."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _dirac_init,
            (self.kernel_size, self.features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class PseudoConv3d(nn.Module):
    """Factorized space-time conv (`nn.py:30-88`): 2D spatial conv per frame
    followed by a temporal conv over F (identity/dirac init, zero bias) when
    kernel_size > 1. `zero_init` zeroes the spatial conv (the guided-
    diffusion `zero_module` pattern for output layers).

    `fused=True` routes the temporal conv through the Pallas in-layout
    kernel (`ops/resblock_kernels.py`): no frame transposes, and the
    embedding add / residual add / downstream GroupNorm statistics fuse into
    the same HBM write. Parameter tree is identical either way.
    """

    features: int
    kernel_size: int = 3
    spatial_strides: Tuple[int, int] = (1, 1)
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    # Training-path Pallas routing: the spatial 3x3 conv runs through the
    # DIFFERENTIABLE fused kernel (`ops/conv_vjp.py` custom_vjp around
    # `fused_affine_conv3x3`) with the collapsed GroupNorm affine + SiLU
    # applied in VMEM. Requires `pre_affine`; parameter tree identical.
    train_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: Optional[jax.Array] = None,
        residual: Optional[jax.Array] = None,
        want_stats: bool = False,
        pre_affine=None,
        upsample2x: bool = False,
        skip=None,
    ):
        k = self.kernel_size
        if isinstance(x, PaddedStream) or (
            isinstance(x, (tuple, list)) and isinstance(x[0], PaddedStream)
        ):
            return self._padded_call(
                x, emb, residual, want_stats, pre_affine, upsample2x, skip
            )
        if skip is not None:
            raise ValueError("skip folding is a padded-stream feature")
        if upsample2x:
            raise ValueError("upsample2x requires a PaddedStream input")
        if isinstance(x, (tuple, list)):
            # split formulation: conv(concat(parts)) computed as a sum of
            # per-part convs on a channel-sliced kernel — the concat never
            # exists in HBM. Parameter tree identical to nn.Conv.
            parts = tuple(x)
            b, f, h, w = parts[0].shape[:4]
            cin = sum(p.shape[-1] for p in parts)
            kernel, kbias = _Conv2DParams(
                self.features, k, self.zero_init, name="spatial_conv"
            )(cin)
            use_spatial2 = self.fused and _spatial2_eligible(
                self.features, [p.shape[-1] for p in parts], h * w, k,
                self.spatial_strides,
            )
            if pre_affine is not None and not use_spatial2:
                raise ValueError(
                    "pre_affine requires the spatial2-eligible fused path"
                )
            use_pallas_spatial = (
                PERF_PALLAS_SPATIAL and k == 3
                and self.spatial_strides == (1, 1)
                and self.features % 128 == 0
                and all(p.shape[-1] % 128 == 0 for p in parts)
            )
            y = None
            off = 0
            for pi, p in enumerate(parts):
                pc = p.shape[-1]
                if use_spatial2:
                    from v2a_tpu.ops.resblock_kernels import (
                        fused_affine_conv3x3,
                    )

                    af = bf_ = None
                    if pre_affine is not None:
                        a0, b0 = pre_affine[pi]  # (B, pc) f32
                        af = jnp.broadcast_to(
                            a0[:, None, :], (b, f, pc)
                        ).reshape(b * f, pc)
                        bf_ = jnp.broadcast_to(
                            b0[:, None, :], (b, f, pc)
                        ).reshape(b * f, pc)
                    yp = fused_affine_conv3x3(
                        p.reshape(b * f, h, w, pc).astype(self.dtype),
                        kernel[:, :, off:off + pc],
                        kbias if y is None else jnp.zeros_like(kbias),
                        a=af, b=bf_, silu=pre_affine is not None,
                        interpret=jax.default_backend() == "cpu",
                    )
                elif use_pallas_spatial:
                    from v2a_tpu.ops.resblock_kernels import spatial_conv3x3

                    yp = spatial_conv3x3(
                        p.reshape(b * f, h, w, pc).astype(self.dtype),
                        kernel[:, :, off:off + pc],
                        kbias if y is None else jnp.zeros_like(kbias),
                        interpret=jax.default_backend() == "cpu",
                    )
                elif (
                    PERF_SKIP1X1_DOT and k == 1
                    and self.spatial_strides == (1, 1)
                ):
                    yp = jax.lax.dot_general(
                        p.reshape(b * f, h, w, pc).astype(self.dtype),
                        kernel[:, :, off:off + pc].reshape(
                            pc, self.features
                        ).astype(self.dtype),
                        (((3,), (0,)), ((), ())),
                        preferred_element_type=self.dtype,
                    )
                else:
                    yp = jax.lax.conv_general_dilated(
                        p.reshape(b * f, h, w, pc).astype(self.dtype),
                        kernel[:, :, off:off + pc].astype(self.dtype),
                        self.spatial_strides,
                        [(k // 2, k // 2), (k // 2, k // 2)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                y = yp if y is None else y + yp
                off += pc
            if not (use_pallas_spatial or use_spatial2):
                y = y + kbias.astype(self.dtype)
        else:
            b, f, h, w, c = x.shape
            kernel_init = (
                nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal()
            )
            y = x.reshape(b * f, h, w, c)
            use_spatial2 = self.fused and _spatial2_eligible(
                self.features, [c], h * w, k, self.spatial_strides
            )
            use_train_fused = (
                self.train_fused and not self.fused
                and _spatial2_eligible(
                    self.features, [c], h * w, k, self.spatial_strides
                )
            )
            if pre_affine is not None and not (
                use_spatial2 or use_train_fused
            ):
                raise ValueError(
                    "pre_affine requires the spatial2-eligible fused path"
                )
            if use_train_fused:
                from v2a_tpu.ops.conv_vjp import (
                    affine_silu_conv3x3, plain_conv3x3,
                )

                kernel, bias2 = _Conv2DParams(
                    self.features, k, self.zero_init, name="spatial_conv"
                )(c)
                wgrad_here = (
                    PERF_TRAIN_WGRAD_PALLAS
                    and h * w >= PERF_TRAIN_WGRAD_MIN_S
                )
                if pre_affine is not None:
                    a0, b0 = pre_affine  # (B, C) f32
                    af = jnp.broadcast_to(
                        a0[:, None, :], (b, f, c)
                    ).reshape(b * f, c)
                    bf_ = jnp.broadcast_to(
                        b0[:, None, :], (b, f, c)
                    ).reshape(b * f, c)
                    y = affine_silu_conv3x3(
                        y.astype(self.dtype), kernel, bias2, af, bf_,
                        dgrad_pallas=PERF_TRAIN_DGRAD_PALLAS,
                        interpret=jax.default_backend() == "cpu",
                        wgrad_pallas=wgrad_here,
                    )
                else:
                    y = plain_conv3x3(
                        y.astype(self.dtype), kernel, bias2,
                        dgrad_pallas=PERF_TRAIN_DGRAD_PALLAS,
                        interpret=jax.default_backend() == "cpu",
                        wgrad_pallas=wgrad_here,
                    )
            elif use_spatial2:
                from v2a_tpu.ops.resblock_kernels import fused_affine_conv3x3

                kernel, bias2 = _Conv2DParams(
                    self.features, k, self.zero_init, name="spatial_conv"
                )(c)
                af = bf_ = None
                if pre_affine is not None:
                    a0, b0 = pre_affine  # (B, C) f32
                    af = jnp.broadcast_to(
                        a0[:, None, :], (b, f, c)
                    ).reshape(b * f, c)
                    bf_ = jnp.broadcast_to(
                        b0[:, None, :], (b, f, c)
                    ).reshape(b * f, c)
                y = fused_affine_conv3x3(
                    y.astype(self.dtype), kernel, bias2,
                    a=af, b=bf_, silu=pre_affine is not None,
                    interpret=jax.default_backend() == "cpu",
                )
            elif (
                PERF_PALLAS_SPATIAL
                and self.fused
                and k == 3
                and self.spatial_strides == (1, 1)
                and c % 128 == 0
                and self.features % 128 == 0
            ):
                from v2a_tpu.ops.resblock_kernels import spatial_conv3x3

                kernel, bias2 = _Conv2DParams(
                    self.features, k, self.zero_init, name="spatial_conv"
                )(c)
                y = spatial_conv3x3(
                    y.astype(self.dtype), kernel, bias2,
                    interpret=jax.default_backend() == "cpu",
                )
            elif (
                PERF_SPATIAL_IM2COL
                and k == 3
                and self.spatial_strides == (1, 1)
            ):
                kernel, bias2 = _Conv2DParams(
                    self.features, k, self.zero_init, name="spatial_conv"
                )(c)
                y = _im2col_conv(y, kernel, bias2, self.dtype)
            elif (
                PERF_SKIP1X1_DOT and k == 1
                and self.spatial_strides == (1, 1)
            ):
                kernel, bias2 = _Conv2DParams(
                    self.features, k, self.zero_init, name="spatial_conv"
                )(c)
                y = jax.lax.dot_general(
                    y.astype(self.dtype),
                    kernel.reshape(c, self.features).astype(self.dtype),
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=self.dtype,
                ) + bias2.astype(self.dtype)
            else:
                y = nn.Conv(
                    self.features, (k, k), strides=self.spatial_strides,
                    padding=k // 2, dtype=self.dtype, kernel_init=kernel_init,
                    name="spatial_conv",
                )(y)
        nh, nw = y.shape[1], y.shape[2]
        y = y.reshape(b, f, nh, nw, self.features)
        has_temporal = k > 1 and not PERF_ABLATE_TEMPORAL
        # the Pallas kernel wants lane-aligned channels; the only narrow
        # case in the real model is the 3-channel output head
        use_fused = (
            self.fused and has_temporal and self.features % 128 == 0
            and self.features >= PERF_FUSED_MIN_CH
        )
        if (
            has_temporal and not use_fused
            and PERF_TRAIN_TCONV_DOT and self.train_fused
        ):
            # tap-dot form for training (see PERF_TRAIN_TCONV_DOT above):
            # out[fo] = sum_t y[fo + t - k//2] @ W[t] + bias, zero padded.
            kernel, tbias = _TemporalConvParams(
                self.features, k, name="temporal_conv"
            )()
            ypad = jnp.pad(
                y, ((0, 0), (k // 2, k // 2), (0, 0), (0, 0), (0, 0))
            )
            out = None
            for t in range(k):
                part = jax.lax.dot_general(
                    ypad[:, t:t + f].astype(self.dtype),
                    kernel[t].astype(self.dtype),
                    (((4,), (0,)), ((), ())),
                    preferred_element_type=self.dtype,
                )
                out = part if out is None else out + part
            y = out + tbias.astype(self.dtype)
        elif has_temporal and not use_fused:
            # temporal conv over F with spatial dims folded into the batch
            # (`nn.py:74-84`). Measured at the production shape
            # (8,7,128,128,128) on a v5e chip: this transpose+conv1d form
            # gives 2.90 frames/s end-to-end vs 2.87 for a (k,1,1) 3D conv
            # (with a pathological compile) and 2.67 for tap-shifted
            # einsums — XLA already optimizes the transpose pair.
            t = y.transpose(0, 2, 3, 1, 4).reshape(b * nh * nw, f, self.features)
            t = nn.Conv(
                self.features, (k,), padding=k // 2, dtype=self.dtype,
                kernel_init=_dirac_init, bias_init=nn.initializers.zeros,
                name="temporal_conv",
            )(t)
            y = t.reshape(b, nh, nw, f, self.features).transpose(0, 3, 1, 2, 4)
        elif use_fused:
            from v2a_tpu.ops.resblock_kernels import (
                temporal_conv_fused,
                temporal_conv_fused_hw,
            )

            kernel, bias = _TemporalConvParams(
                self.features, k, name="temporal_conv"
            )()
            if (
                PERF_TCONV_XLA2D_MIN_S
                and nh * nw >= PERF_TCONV_XLA2D_MIN_S
            ):
                return _tconv_conv2d(
                    y, kernel, bias, emb, residual, want_stats, self.dtype
                )
            tconv = temporal_conv_fused_hw if PERF_TCONV_HW else temporal_conv_fused
            return tconv(
                y.astype(self.dtype), kernel, bias, emb=emb,
                residual=residual, want_stats=want_stats,
                interpret=jax.default_backend() == "cpu",
            )
        # non-fused fallbacks for the extras so callers need no branching
        if emb is not None:
            y = y + emb.reshape(b, *([1] * (y.ndim - 2)), self.features).astype(
                y.dtype
            )
        if residual is not None:
            y = y + residual.astype(y.dtype)
        if want_stats:
            yf = y.astype(jnp.float32)
            stats = jnp.stack(
                [jnp.sum(yf, axis=(2, 3)), jnp.sum(yf * yf, axis=(2, 3))],
                axis=2,
            )  # (B, F, 2, C)
            return y, stats
        return y

    def _padded_call(self, x, emb, residual, want_stats, pre_affine,
                     upsample2x=False, skip=None):
        """Padded-stream variant (`PERF_PADDED_STREAM`): inputs/outputs are
        `PaddedStream`s, the spatial conv runs through
        `fused_affine_conv3x3_padded` (no per-conv HBM pad pass, Element
        out spec onto interior rows), and the temporal conv runs in
        row-banded padded form (`temporal_conv_padded`) whose emitted
        GroupNorm statistics are exact interior statistics. Parameter tree
        identical to the plain path."""
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        hw = parts[0].hw
        b, f, hp, wp = parts[0].x.shape[:4]
        feat = self.features
        k = self.kernel_size
        interp = jax.default_backend() == "cpu"
        cin = sum(p.x.shape[-1] for p in parts)

        if k == 1:
            # 1x1 conv as a dot on the padded stream (garbage rows map to
            # garbage rows — never consumed; zero cols map to the bias,
            # masked by the temporal conv that consumes this as residual)
            if want_stats or emb is not None or residual is not None:
                raise ValueError("padded 1x1 conv is the bare skip proj")
            kernel, kbias = _Conv2DParams(
                feat, 1, self.zero_init, name="spatial_conv"
            )(cin)
            k2 = kernel.reshape(cin, feat)
            y = None
            off = 0
            for p in parts:
                pc = p.x.shape[-1]
                yp = jax.lax.dot_general(
                    p.x.astype(self.dtype),
                    k2[off:off + pc].astype(self.dtype),
                    (((4,), (0,)), ((), ())),
                    preferred_element_type=self.dtype,
                )
                y = yp if y is None else y + yp
                off += pc
            y = y + kbias.astype(self.dtype)
            return PaddedStream(y, hw)

        if k != 3 or self.spatial_strides not in ((1, 1), (2, 2)):
            raise ValueError("padded stream supports 3x3 stride-1/2 convs")
        from v2a_tpu.ops.resblock_kernels import (
            fused_affine_conv3x3_padded,
            fused_conv_tconv_padded,
            fused_downconv3x3_padded,
            fused_upconv3x3_padded,
            temporal_conv_padded,
        )

        if self.spatial_strides == (2, 2):
            # padded-stream downsample: stride-2 conv to the halved
            # resolution, then the padded temporal conv there
            if len(parts) != 1 or pre_affine is not None or (
                residual is not None or skip is not None
            ):
                raise ValueError("padded stride-2 conv is the bare "
                                 "Downsample conv")
            p = parts[0]
            hh, ww = hw
            kernel, kbias = _Conv2DParams(
                feat, k, self.zero_init, name="spatial_conv"
            )(cin)
            y = fused_downconv3x3_padded(
                p.x.reshape(b * f, hp, wp, cin).astype(self.dtype),
                kernel, kbias, hw, interpret=interp,
            )
            hw2 = (hh // 2, ww // 2)
            from v2a_tpu.ops.resblock_kernels import padded_hw as _phw3

            hp2, wp2 = _phw3(*hw2)
            tkernel, tbias = _TemporalConvParams(
                feat, k, name="temporal_conv"
            )()
            out = temporal_conv_padded(
                y.reshape(b, f, hp2, wp2, feat).astype(self.dtype),
                tkernel, tbias, hw2, emb=emb, residual=None,
                want_stats=want_stats, interpret=interp,
            )
            if want_stats:
                yt, stats = out
                return PaddedStream(yt, hw2), stats
            return PaddedStream(out, hw2)

        if upsample2x:
            # conv3x3(nearest_2x(x)) as the collapsed 4-parity low-res conv
            # (44% of the FLOPs, no upsampled activation in HBM), then the
            # padded temporal conv at the new resolution
            if len(parts) != 1 or pre_affine is not None:
                raise ValueError("upsample conv is single-part, no affine")
            p = parts[0]
            hh, ww = hw
            kernel, kbias = _Conv2DParams(
                feat, k, self.zero_init, name="spatial_conv"
            )(cin)
            y = fused_upconv3x3_padded(
                p.x.reshape(b * f, hp, wp, cin).astype(self.dtype),
                kernel, kbias, hw, interpret=interp,
            )
            hw2 = (2 * hh, 2 * ww)
            from v2a_tpu.ops.resblock_kernels import padded_hw as _phw2

            hp2, wp2 = _phw2(*hw2)
            tkernel, tbias = _TemporalConvParams(
                feat, k, name="temporal_conv"
            )()
            out = temporal_conv_padded(
                y.reshape(b, f, hp2, wp2, feat).astype(self.dtype),
                tkernel, tbias, hw2, emb=emb, residual=None,
                want_stats=want_stats, interpret=interp,
            )
            if want_stats:
                yt, stats = out
                return PaddedStream(yt, hw2), stats
            return PaddedStream(out, hw2)

        kernel, kbias = _Conv2DParams(
            feat, k, self.zero_init, name="spatial_conv"
        )(cin)
        pre = pre_affine
        if pre is not None and not isinstance(pre[0], (tuple, list)):
            pre = [pre]
        kparts = []
        mparts = []
        off = 0
        for pi, p in enumerate(parts):
            pc = p.x.shape[-1]
            if pre is None:
                # no preceding norm (the Upsample conv): identity affine —
                # the kernel's interior mask still guards the pad values
                a0 = jnp.ones((b, pc), jnp.float32)
                b0 = jnp.zeros((b, pc), jnp.float32)
            else:
                a0, b0 = pre[pi]
            af = jnp.broadcast_to(a0[:, None, :], (b, f, pc)).reshape(b * f, pc)
            bf_ = jnp.broadcast_to(b0[:, None, :], (b, f, pc)).reshape(b * f, pc)
            kparts.append((
                p.x.reshape(b * f, hp, wp, pc).astype(self.dtype),
                kernel[:, :, off:off + pc], af, bf_,
            ))
            mparts.append((
                p.x.astype(self.dtype), kernel[:, :, off:off + pc], af, bf_,
            ))
            off += pc

        tkernel, tbias = _TemporalConvParams(
            feat, k, name="temporal_conv"
        )()
        from v2a_tpu.ops.resblock_kernels import (
            conv_tconv_band_rows, fused_conv_tconv_stream, padded_hw as _phw,
            stream_band_rows,
        )

        skip_cins = []
        s_streams = s_kernel = s_bias = None
        if skip is not None:
            s_streams, s_kernel, s_bias = skip
            skip_cins = [p.x.shape[-1] for p in s_streams]

        if PERF_STREAM_KERNEL and skip is None and stream_band_rows(
            hw[0], hw[1], _phw(*hw)[1], [p.x.shape[-1] for p in parts], feat,
        ) > 0:
            out = fused_conv_tconv_stream(
                mparts, kbias, tkernel, tbias, hw, emb=emb,
                residual=residual.x if residual is not None else None,
                silu=pre is not None, want_stats=want_stats,
                interpret=interp,
            )
            if want_stats:
                yt, stats = out
                return PaddedStream(yt, hw), stats
            return PaddedStream(out, hw)

        mega_ok = PERF_MEGA_KERNEL and conv_tconv_band_rows(
            hw[0], hw[1], _phw(*hw)[1], [p.x.shape[-1] for p in parts],
            feat, f, has_res=residual is not None, skip_cins=skip_cins,
        ) > 0
        if mega_ok:
            skip_parts = None
            if skip is not None:
                skip_parts = []
                off = 0
                for p in s_streams:
                    pc = p.x.shape[-1]
                    skip_parts.append(
                        (p.x.astype(self.dtype), s_kernel[off:off + pc])
                    )
                    off += pc
            out = fused_conv_tconv_padded(
                mparts, kbias, tkernel, tbias, hw, emb=emb,
                residual=residual.x if residual is not None else None,
                skip_parts=skip_parts, skip_bias=s_bias,
                silu=pre is not None, want_stats=want_stats,
                interpret=interp,
            )
            if want_stats:
                yt, stats = out
                return PaddedStream(yt, hw), stats
            return PaddedStream(out, hw)

        y = fused_affine_conv3x3_padded(
            kparts, kbias, hw, silu=pre is not None, interpret=interp
        )
        tc_skip = None
        if skip is not None:
            # fold the 1x1 skip projection into the temporal conv
            tc_skip = []
            off = 0
            for p in s_streams:
                pc = p.x.shape[-1]
                tc_skip.append(
                    (p.x.astype(self.dtype), s_kernel[off:off + pc])
                )
                off += pc
        out = temporal_conv_padded(
            y.reshape(b, f, hp, wp, feat).astype(self.dtype),
            tkernel, tbias, hw, emb=emb,
            residual=residual.x if residual is not None else None,
            skip_parts=tc_skip, skip_bias=s_bias if skip is not None else None,
            want_stats=want_stats, interpret=interp,
        )
        if want_stats:
            yt, stats = out
            return PaddedStream(yt, hw), stats
        return PaddedStream(out, hw)


def _dirac_init(key, shape, dtype=jnp.float32):
    """Identity init for a (k, in, out) temporal conv kernel: center tap is
    the identity matrix (`nn.py:48-50` nn.init.dirac_)."""
    k, cin, cout = shape
    w = jnp.zeros(shape, dtype)
    eye = jnp.eye(cin, cout, dtype=dtype)
    return w.at[k // 2].set(eye)


class ResBlock3D(nn.Module):
    """`ResBlock` (`unet.py:148-262`) without up/down fusion (the Libero
    config uses plain Down/Upsample modules, resblock_updown=False).

    `fused=True` (with `stats` optionally forwarded from the producer of x)
    runs the interior through the Pallas temporal-conv kernel: the
    emb-add, residual-add, and both GroupNorms' statistics ride the same
    HBM passes, and the block returns `(out, out_stats)` so the next norm
    can skip its statistics read too.
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas_gn: bool = False
    fused: bool = False
    # Differentiable Pallas routing for TRAINING (see ops/conv_vjp.py):
    # both GN->SiLU->conv3x3 halves run through the custom_vjp fused
    # kernel — the normed tensor never hits HBM and the forward convs pay
    # no {3,0,2,1} relayouts. Same eligibility gate as the inference sp2.
    train_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        stats: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        if self.fused:
            return self._fused(x, emb, stats, deterministic)
        c = x.shape[-1]
        tf = (
            self.train_fused
            and not self.use_scale_shift_norm and self.dropout == 0
            and _spatial2_eligible(
                self.out_channels, [c, self.out_channels],
                x.shape[2] * x.shape[3], 3, (1, 1),
            )
        )
        if tf:
            # hand the collapsed GN affine to the differentiable Pallas
            # conv instead of materializing the normed tensor
            pre1 = GroupNorm32(
                with_silu=True, use_pallas=False, name="in_norm"
            )(x, return_affine=True)
            h = PseudoConv3d(
                self.out_channels, 3, dtype=self.dtype, train_fused=True,
                name="in_conv",
            )(x, pre_affine=pre1)
        else:
            h = GroupNorm32(
                with_silu=True, use_pallas=self.use_pallas_gn, name="in_norm"
            )(x).astype(self.dtype)
            h = PseudoConv3d(
                self.out_channels, 3, dtype=self.dtype, name="in_conv"
            )(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb.astype(self.dtype)))
        emb_out = emb_out[:, None, None, None, :]

        pre2 = None
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(use_pallas=self.use_pallas_gn, name="out_norm")(h)
            h = h * (1 + scale) + shift
            h = nn.silu(h).astype(self.dtype)
        elif tf:
            h = h + emb_out
            pre2 = GroupNorm32(
                with_silu=True, use_pallas=False, name="out_norm"
            )(h, return_affine=True)
        else:
            h = h + emb_out
            h = GroupNorm32(
                with_silu=True, use_pallas=self.use_pallas_gn, name="out_norm"
            )(h).astype(self.dtype)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        # NB: this fork of guided-diffusion does NOT zero-init its output
        # convs (zero_module is imported but unused in its unet.py)
        h = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, train_fused=tf,
            name="out_conv",
        )(h, pre_affine=pre2)

        if c != self.out_channels:
            # 1x1 pseudo-3d conv == plain 2D 1x1 (`nn.py:45-46`: no temporal
            # conv at kernel_size 1)
            x = PseudoConv3d(
                self.out_channels, 1, dtype=self.dtype, name="skip_conv"
            )(x)
        return x + h

    def _fused(self, x, emb, stats, deterministic):
        """Same math, Pallas interior. Module names match the plain path so
        the parameter tree (and converted checkpoints) are identical.

        `x` may be a TUPLE of channel parts (the up-path (h, skip) pair,
        never concatenated — `PERF_SPLIT_SKIP`); `stats` is then a matching
        tuple of per-part (B, F, 2, C_i) stats (entries may be None)."""
        if isinstance(x, tuple):
            return self._fused_split(x, emb, stats, deterministic)
        if isinstance(x, PaddedStream):
            return self._fused_padded(x, emb, stats)
        c = x.shape[-1]
        st_in = jnp.sum(stats, axis=1) if stats is not None else None
        # deep levels: hand the collapsed GroupNorm affine to the Pallas conv
        # kernel instead of materializing the normed tensor (see
        # PERF_PALLAS_SPATIAL2_MIN_CH)
        sp2 = (
            _spatial2_eligible(
                self.out_channels, [c, self.out_channels],
                x.shape[2] * x.shape[3], 3, (1, 1),
            )
            and not self.use_scale_shift_norm
            and self.dropout == 0
        )
        if sp2:
            pre1 = GroupNorm32(
                with_silu=True, use_pallas=False, name="in_norm"
            )(x, stats=st_in, return_affine=True)
            h = x
        else:
            pre1 = None
            h = GroupNorm32(
                with_silu=True, use_pallas=False, name="in_norm"
            )(x, stats=st_in).astype(self.dtype)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb.astype(self.dtype)))

        conv_emb = None if self.use_scale_shift_norm else emb_out
        h, h_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True, name="in_conv"
        )(h, emb=conv_emb, want_stats=True, pre_affine=pre1)

        st2 = jnp.sum(h_stats, axis=1)  # (B, 2, C) over frames
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, None, :], 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h, stats=st2)
            h = h * (1 + scale) + shift
            h = nn.silu(h).astype(self.dtype)
            pre2 = None
        elif sp2:
            pre2 = GroupNorm32(with_silu=True, name="out_norm")(
                h, stats=st2, return_affine=True
            )
        else:
            h = GroupNorm32(with_silu=True, name="out_norm")(
                h, stats=st2
            ).astype(self.dtype)
            pre2 = None
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        if c != self.out_channels:
            x = PseudoConv3d(
                self.out_channels, 1, dtype=self.dtype, name="skip_conv"
            )(x)
        out, out_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True,
            name="out_conv",
        )(h, residual=x, want_stats=True, pre_affine=pre2)
        return out, out_stats

    def _fused_padded(self, x, emb, stats):
        """Padded-stream single-input variant: same math as `_fused`, but
        all activations stay in the (B, F, Hp, Wp, C) padded layout —
        norms collapse to affines from exact (pad-corrected) stats, convs
        run through the padded Pallas kernel, and the residual add rides
        the temporal conv."""
        from v2a_tpu.ops.resblock_kernels import stats_to_group_affine

        if self.use_scale_shift_norm or self.dropout > 0:
            raise ValueError("padded stream: plain-norm dropout-free blocks")
        b, f = x.x.shape[:2]
        hh, ww = x.hw
        c = x.x.shape[-1]
        n_pc = f * hh * ww
        if stats is not None:
            st_in = jnp.sum(stats, axis=1)
        else:
            xi = unpad_stream(x).astype(jnp.float32)
            st_in = jnp.stack(
                [xi.sum(axis=(1, 2, 3)), (xi * xi).sum(axis=(1, 2, 3))],
                axis=1,
            )
        scale1, bias1 = _NormParams(c, name="in_norm")()
        pre1 = stats_to_group_affine(st_in, scale1, bias1, n_pc, 32)

        emb_out = nn.Dense(
            self.out_channels, dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb.astype(self.dtype)))
        h, h_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True, name="in_conv"
        )(x, emb=emb_out, want_stats=True, pre_affine=pre1)

        st2 = jnp.sum(h_stats, axis=1)
        scale2, bias2 = _NormParams(self.out_channels, name="out_norm")()
        pre2 = stats_to_group_affine(st2, scale2, bias2, n_pc, 32)

        skip_arg = None
        res_arg = x
        if c != self.out_channels:
            ks, bs = _SkipConvParams(
                self.out_channels, name="skip_conv"
            )(c)
            skip_arg = ((x,), ks.reshape(c, self.out_channels), bs)
            res_arg = None
        out, out_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True,
            name="out_conv",
        )(h, residual=res_arg, want_stats=True, pre_affine=pre2,
          skip=skip_arg)
        return out, out_stats

    def _fused_split_padded(self, parts, emb, part_stats):
        """Split + padded-stream variant: the up-path (h, skip) pair, both
        in padded layout, convolved as channel-split sums inside one
        padded Pallas call."""
        from v2a_tpu.ops.resblock_kernels import stats_to_group_affine

        if self.use_scale_shift_norm or self.dropout > 0:
            raise ValueError("padded stream: plain-norm dropout-free blocks")
        if part_stats is None:
            part_stats = (None,) * len(parts)
        b, f = parts[0].x.shape[:2]
        hh, ww = parts[0].hw
        n_pc = f * hh * ww
        c = sum(p.x.shape[-1] for p in parts)

        sts = []
        for p, st in zip(parts, part_stats):
            if st is not None:
                sts.append(jnp.sum(st, axis=1))
            else:
                pf = unpad_stream(p).astype(jnp.float32)
                sts.append(jnp.stack(
                    [pf.sum(axis=(1, 2, 3)), (pf * pf).sum(axis=(1, 2, 3))],
                    axis=1,
                ))
        st_in = jnp.concatenate(sts, axis=-1)
        scale1, bias1 = _NormParams(c, name="in_norm")()
        a, bshift = stats_to_group_affine(st_in, scale1, bias1, n_pc, 32)
        pre1 = []
        off = 0
        for p in parts:
            pc = p.x.shape[-1]
            pre1.append((a[:, off:off + pc], bshift[:, off:off + pc]))
            off += pc

        emb_out = nn.Dense(
            self.out_channels, dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb.astype(self.dtype)))
        h, h_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True, name="in_conv"
        )(parts, emb=emb_out, want_stats=True, pre_affine=pre1)

        st2 = jnp.sum(h_stats, axis=1)
        scale2, bias2 = _NormParams(self.out_channels, name="out_norm")()
        pre2 = stats_to_group_affine(st2, scale2, bias2, n_pc, 32)

        ks, bs = _SkipConvParams(self.out_channels, name="skip_conv")(c)
        out, out_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True,
            name="out_conv",
        )(h, want_stats=True, pre_affine=pre2,
          skip=(tuple(parts), ks.reshape(c, self.out_channels), bs))
        return out, out_stats

    def _fused_split(self, parts, emb, part_stats, deterministic):
        """The (h, skip) pair variant: GroupNorm collapses to per-channel
        affines applied per part, and in_conv/skip_conv run as channel-split
        convolution sums — the concatenation never hits HBM."""
        from v2a_tpu.ops.resblock_kernels import stats_to_group_affine

        if isinstance(parts[0], PaddedStream):
            return self._fused_split_padded(parts, emb, part_stats)
        if part_stats is None:
            part_stats = (None,) * len(parts)
        c = sum(p.shape[-1] for p in parts)
        if c == self.out_channels:
            raise ValueError("split path expects a channel-changing block")

        # per-channel (B, 2, C_i) stats per part, forwarded or recomputed
        sts = []
        for p, st in zip(parts, part_stats):
            if st is not None:
                sts.append(jnp.sum(st, axis=1))
            else:
                pf = p.astype(jnp.float32)
                sts.append(jnp.stack(
                    [pf.sum(axis=(1, 2, 3)), (pf * pf).sum(axis=(1, 2, 3))],
                    axis=1,
                ))
        st_in = jnp.concatenate(sts, axis=-1)  # (B, 2, C)

        scale, bias = _NormParams(c, name="in_norm")()
        n_pc = 1
        for d in parts[0].shape[1:-1]:
            n_pc *= d
        a, bshift = stats_to_group_affine(st_in, scale, bias, n_pc, 32)
        sp2 = (
            _spatial2_eligible(
                self.out_channels,
                [p.shape[-1] for p in parts] + [self.out_channels],
                parts[0].shape[2] * parts[0].shape[3], 3, (1, 1),
            )
            and not self.use_scale_shift_norm
            and self.dropout == 0
        )
        off = 0
        bdim = parts[0].shape[0]
        bc = (bdim,) + (1,) * (parts[0].ndim - 2)
        if sp2:
            # per-part affine handed to the Pallas conv kernel; the normed
            # parts never hit HBM
            pre1 = []
            for p in parts:
                pc = p.shape[-1]
                pre1.append((a[:, off:off + pc], bshift[:, off:off + pc]))
                off += pc
            conv_in = parts
        else:
            normed = []
            for p in parts:
                pc = p.shape[-1]
                ai = a[:, off:off + pc].reshape(bc + (pc,))
                bi = bshift[:, off:off + pc].reshape(bc + (pc,))
                normed.append(
                    nn.silu(p.astype(jnp.float32) * ai + bi).astype(self.dtype)
                )
                off += pc
            pre1 = None
            conv_in = tuple(normed)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb.astype(self.dtype)))
        conv_emb = None if self.use_scale_shift_norm else emb_out
        h, h_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True, name="in_conv"
        )(conv_in, emb=conv_emb, want_stats=True, pre_affine=pre1)

        st2 = jnp.sum(h_stats, axis=1)
        if self.use_scale_shift_norm:
            sc, sh = jnp.split(emb_out[:, None, None, None, :], 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h, stats=st2)
            h = h * (1 + sc) + sh
            h = nn.silu(h).astype(self.dtype)
            pre2 = None
        elif sp2:
            pre2 = GroupNorm32(with_silu=True, name="out_norm")(
                h, stats=st2, return_affine=True
            )
        else:
            h = GroupNorm32(with_silu=True, name="out_norm")(
                h, stats=st2
            ).astype(self.dtype)
            pre2 = None
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        x_skip = PseudoConv3d(
            self.out_channels, 1, dtype=self.dtype, name="skip_conv"
        )(parts)
        out, out_stats = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, fused=True,
            name="out_conv",
        )(h, residual=x_skip, want_stats=True, pre_affine=pre2)
        return out, out_stats


class SpatialAttentionBlock(nn.Module):
    """Per-frame spatial self-attention (`unet.py:263-330`): frames fold
    into the batch, tokens are the H*W pixels."""

    num_head_channels: int = 32
    dtype: jnp.dtype = jnp.float32
    use_pallas_gn: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        stats: Optional[jax.Array] = None,
        want_stats: bool = False,
    ):
        was_padded = isinstance(x, PaddedStream)
        entered = False
        if not was_padded and PERF_PALLAS_ATTN and stats is not None:
            # The attention levels (ds 8/16 -> 16x16 and 8x8 maps) sit
            # BELOW the padded-stream levels (hw > 512), so without this
            # local entry the fused kernel never fires on the shipped
            # config — round 3's first "in-chain neutral" A/B compared two
            # identical programs. Padding here costs a ~1 MB copy; the
            # kernel replaces the GN pass + QKV/attn/proj dots + the next
            # block's statistics read.
            x = pad_stream(x.astype(self.dtype))
            entered = True
        if isinstance(x, PaddedStream) and PERF_PALLAS_ATTN and stats is not None:
            # one-kernel path: GN affine + QKV + attention + proj +
            # residual consumed/produced in the padded layout, emitting
            # the output's interior statistics for the next block
            from v2a_tpu.ops.resblock_kernels import (
                fused_spatial_attention_padded,
                stats_to_group_affine,
            )

            hh, ww = x.hw
            bb, f, hp, wp, c = x.x.shape
            scale, bias = _NormParams(c, name="norm")()
            a, b_aff = stats_to_group_affine(
                stats.reshape(bb * f, 2, c), scale, bias, hh * ww
            )
            wqkv, bqkv = _DenseParams(c * 3, name="qkv")(c)
            wproj, bproj = _DenseParams(c, name="proj_out")(c)
            out = fused_spatial_attention_padded(
                x.x.reshape(bb * f, hp, wp, c), (hh, ww), a, b_aff,
                wqkv, bqkv, wproj, bproj, self.num_head_channels,
                want_stats=want_stats,
                interpret=jax.default_backend() == "cpu",
            )
            if want_stats:
                y, new_stats = out
                y_ps = PaddedStream(y.reshape(bb, f, hp, wp, c), (hh, ww))
                if entered:
                    return unpad_stream(y_ps), new_stats.reshape(bb, f, 2, c)
                return y_ps, new_stats.reshape(bb, f, 2, c)
            y_ps = PaddedStream(out.reshape(bb, f, hp, wp, c), (hh, ww))
            return unpad_stream(y_ps) if entered else y_ps
        if was_padded:
            # attention needs exact token sets: drop to the interior view
            # and re-enter the padded layout after (the forwarded stats
            # describe the interior, so they stay valid)
            x = unpad_stream(x)
        b, f, h, w, c = x.shape
        n_heads = c // self.num_head_channels
        ch = self.num_head_channels

        y = x.reshape(b * f, h * w, c)
        # the attention norm is per (batch, frame) sample (`unet.py:304-309`)
        # so forwarded per-(B, F, C) stats reshape directly onto it
        st = stats.reshape(b * f, 2, c) if stats is not None else None
        y_norm = GroupNorm32(use_pallas=self.use_pallas_gn, name="norm")(
            y, stats=st
        ).astype(self.dtype)
        qkv = nn.Dense(c * 3, dtype=self.dtype, name="qkv")(y_norm)
        # legacy layout: reshape to heads then split qkv (`unet.py:346-358`)
        qkv = qkv.reshape(b * f, h * w, n_heads, 3 * ch)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        if PERF_ATTN_HMAJOR:
            # one (t,h)-transpose of the fused qkv instead of the separate
            # q/k/v head-major relayouts XLA inserts for the einsum below
            # — same math, fewer relayout fusions (param tree identical)
            qkv_h = jnp.swapaxes(qkv, 1, 2)  # (bf, heads, t, 3ch)
            q, k, v = jnp.split(qkv_h, 3, axis=-1)
            logits = jnp.einsum(
                "bhtc,bhsc->bhts", q * scale, k * scale,
                preferred_element_type=jnp.float32,
            )
            weights = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
            out = jnp.swapaxes(
                jnp.einsum("bhts,bhsc->bhtc", weights, v), 1, 2
            )  # back to (bf, t, heads, ch)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            logits = jnp.einsum(
                "bthc,bshc->bhts", q * scale, k * scale,
                preferred_element_type=jnp.float32,
            )
            weights = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
            out = jnp.einsum("bhts,bshc->bthc", weights, v)
        out = out.reshape(b * f, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        result = (y + out).reshape(b, f, h, w, c)
        result = pad_stream(result) if was_padded else result
        if want_stats:
            # per-frame interior sum/sumsq of the OUTPUT (an XLA reduction
            # fused into the residual add) so the next block keeps its
            # forwarded-stats fast path instead of re-reading the tensor
            of = (y + out).astype(jnp.float32).reshape(b, f, h * w, c)
            new_stats = jnp.stack(
                [of.sum(axis=2), (of * of).sum(axis=2)], axis=2
            )
            return result, new_stats
        return result


class Downsample3D(nn.Module):
    """Spatial stride-2 pseudo-3D conv (`unet.py:119-145`, stride (1,2,2))."""

    features: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, want_stats: bool = False,
        padded_out: bool = False,
    ):
        if padded_out and PERF_DOWNCONV:
            # padded-stream stride-2 kernel: reads the full-res stream
            # directly (in-kernel interior mask) and writes the half-res
            # padded stream
            if not isinstance(x, PaddedStream):
                x = pad_stream(x)
            return PseudoConv3d(
                self.features, 3, spatial_strides=(2, 2), dtype=self.dtype,
                fused=self.fused, name="conv",
            )(x, want_stats=want_stats)
        if isinstance(x, PaddedStream):
            # the stride-2 conv's SAME halo must be zeros; the stream's pad
            # values are arbitrary, so drop to the interior view first
            x = unpad_stream(x)
        out = PseudoConv3d(
            self.features, 3, spatial_strides=(2, 2), dtype=self.dtype,
            fused=self.fused, name="conv",
        )(x, want_stats=want_stats)
        return out


class Upsample3D(nn.Module):
    """Nearest 2x spatial upsample + conv (`unet.py:86-116`)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    train_fused: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, want_stats: bool = False,
        padded_out: bool = False,
    ):
        if padded_out and PERF_UPCONV:
            # collapsed-parity upsample conv: reads the LOW-RES stream
            if not isinstance(x, PaddedStream):
                x = pad_stream(x)
            return PseudoConv3d(
                self.features, 3, dtype=self.dtype, fused=self.fused,
                name="conv",
            )(x, want_stats=want_stats, upsample2x=True)
        if isinstance(x, PaddedStream):
            x = unpad_stream(x)
        b, f, h, w, c = x.shape
        # nearest 2x as broadcast+reshape: `jax.image.resize` lowers to a
        # gather that XLA turns into per-row while loops on TPU (~0.9 ms
        # each at the 128x64 level, seen in the round-2 trace); the
        # broadcast form fuses into the surrounding elementwise work
        x = jnp.broadcast_to(
            x[:, :, :, None, :, None, :], (b, f, h, 2, w, 2, c)
        ).reshape(b, f, h * 2, w * 2, c)
        if padded_out:
            # slice + broadcast + pad fuse into one XLA pass; the conv then
            # runs in padded-stream form (identity pre-affine)
            x = pad_stream(x)
        return PseudoConv3d(
            self.features, 3, dtype=self.dtype, fused=self.fused,
            train_fused=self.train_fused, name="conv"
        )(x, want_stats=want_stats)


class VideoUNet(nn.Module):
    """The full model. Input (B, F, H, W, in_channels) where the conditioning
    frame is already concatenated on channels; output (B, F, H, W,
    out_channels)."""

    in_channels: int = 6
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16)
    channel_mult: Sequence[int] = (1, 2, 3, 4, 5)
    num_head_channels: int = 32
    task_token_dim: int = 512
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas_gn: bool = False
    # Pallas ResBlock-interior fusion (temporal conv + emb/residual adds +
    # GroupNorm statistics forwarding); numerically equivalent, TPU-fast
    fused: bool = False
    # Gradient checkpointing: rematerialize each ResBlock/attention block
    # during the backward pass instead of storing its activations — the
    # reference's `use_checkpoint` (`.../guided_diffusion/nn.py:192-236`,
    # wired per-block at `.../guided_diffusion/unet.py:160,174,184`). Only
    # meaningful for training, so it applies to the non-fused path (the
    # fused Pallas kernels are inference-only, see VideoPredModel._model_fn).
    use_checkpoint: bool = False
    # Remat granularity when `use_checkpoint`:
    #   "blocks" — per-ResBlock/attention jax.remat (the reference's
    #       granularity): saves every block boundary, recomputes interiors.
    #   "levels" — no per-block remat; instead tag only the resolution-
    #       level transitions (entry conv, downsample/upsample outputs,
    #       middle output) with `checkpoint_name("v2a_level")`. The TRAINER
    #       wraps the whole apply in `jax.checkpoint(policy=
    #       save_only_these_names("v2a_level"))` so only ~10 tensors are
    #       saved and each level (including its skip activations) is
    #       recomputed from its entry boundary during backward — a much
    #       deeper memory lever than block granularity (PERF.md round 4:
    #       block remat doubles the max video-train batch; level remat is
    #       for the batches block remat still cannot hold).
    remat_policy: str = "blocks"
    # TRAINING-path Pallas routing (mutually exclusive with `fused`, which
    # is inference-only): ResBlock GN->SiLU->conv3x3 halves run through the
    # differentiable fused kernel (`ops/conv_vjp.py`), so the training
    # forward pays neither the conv emitter's {3,0,2,1} relayout copies nor
    # the materialized GroupNorm activations (PERF.md round-5 trace: 49 ms
    # of pure layout copies per B=4 step on the plain-XLA path).
    train_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        task_embed: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        mc = self.model_channels
        time_embed_dim = mc * 4

        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_dense0")(
            emb.astype(self.dtype)
        )
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_dense1")(
            nn.silu(emb)
        )

        if task_embed is not None:
            # Perceiver pooling + mean over latents (`unet.py:490-494,670-672`)
            latents = PerceiverResampler(
                dim=self.task_token_dim, depth=2, dtype=self.dtype,
                name="task_attnpool",
            )(task_embed)
            pooled = nn.Dense(
                time_embed_dim, dtype=self.dtype, name="task_proj"
            )(latents).mean(axis=1)
            emb = emb + pooled

        # -- input blocks
        # In fused mode each (activation, stats) pair travels together: the
        # Pallas temporal-conv kernels emit per-(B, F, C) sum/sumsq of their
        # output, which the next GroupNorm consumes instead of re-reading
        # the tensor. Skip-connection stats concatenate channel-wise just
        # like the activations. Attention output breaks the chain (st=None,
        # small tensors at ds 8/16 — the norm recomputes there).
        fused = self.fused
        # Gradient checkpointing (`use_checkpoint`): block-level jax.remat,
        # matching the reference's per-ResBlock/attention checkpoint
        # granularity. Static argnums count `self` as 0 in linen's
        # transform accounting; the Python-bool args (`deterministic`,
        # `want_stats`) must be static under jax.remat, so remat'd blocks
        # are invoked positionally below.
        remat = (
            self.use_checkpoint and not fused
            and self.remat_policy == "blocks"
        )
        tfused = self.train_fused and not fused
        _Res = nn.remat(ResBlock3D, static_argnums=(4,)) if remat else ResBlock3D
        _Attn = (
            nn.remat(SpatialAttentionBlock, static_argnums=(3,))
            if remat
            else SpatialAttentionBlock
        )
        # level-scoped tags (see remat_policy): identity unless the trainer
        # wraps the apply in a save_only_these_names("v2a_level") checkpoint
        if self.use_checkpoint and not fused and self.remat_policy == "levels":
            from jax.ad_checkpoint import checkpoint_name

            _tag = lambda a: checkpoint_name(a, "v2a_level")  # noqa: E731
        else:
            _tag = lambda a: a  # noqa: E731
        hs = []
        st = None
        hh, ww = x.shape[2], x.shape[3]
        l0_padded = fused and _padded_eligible(mc, [mc], hh * ww)
        if l0_padded and PERF_ENTRY_PAD:
            # enter the padded layout BEFORE the entry conv: the 6-channel
            # pad is ~50x cheaper than padding the 128-channel output, and
            # the conv runs in the Pallas padded path (no XLA relayout)
            h = PseudoConv3d(
                mc, 3, dtype=self.dtype, fused=fused, name="in_conv"
            )(pad_stream(x.astype(self.dtype)), want_stats=fused)
        else:
            h = PseudoConv3d(
                mc, 3, dtype=self.dtype, fused=fused, name="in_conv"
            )(x.astype(self.dtype), want_stats=fused)
        if fused:
            h, st = h
        if l0_padded and not isinstance(h, PaddedStream):
            # enter the padded-stream layout for the banded levels: pads
            # once here, the per-conv pad passes inside the level vanish
            h = pad_stream(h)
        h = _tag(h)
        hs.append((h, st))
        ds = 1
        block_idx = 0
        for level, mult in enumerate(self.channel_mult):
            ch = int(mult * mc)
            for _ in range(self.num_res_blocks):
                h = _Res(
                    ch, self.dropout, self.use_scale_shift_norm, self.dtype,
                    self.use_pallas_gn, fused, train_fused=tfused,
                    name=f"down_res_{block_idx}",
                )(h, emb, st, deterministic)
                if fused:
                    h, st = h
                if ds in self.attention_resolutions:
                    h = _Attn(
                        self.num_head_channels, self.dtype,
                        self.use_pallas_gn, name=f"down_attn_{block_idx}",
                    )(h, st, fused)
                    if fused:
                        h, st = h
                    else:
                        st = None
                hs.append((h, st))
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                next_ch = int(self.channel_mult[level + 1] * mc)
                next_padded = fused and _padded_eligible(
                    next_ch, [ch, next_ch], (hh // 2) * (ww // 2)
                )
                h = Downsample3D(
                    ch, self.dtype, fused, name=f"downsample_{level}"
                )(h, want_stats=fused, padded_out=next_padded)
                if fused:
                    h, st = h
                hh, ww = hh // 2, ww // 2
                if next_padded and not isinstance(h, PaddedStream):
                    h = pad_stream(h)
                elif not next_padded and isinstance(h, PaddedStream):
                    h = unpad_stream(h)
                h = _tag(h)
                hs.append((h, st))
                ds *= 2

        # -- middle
        mid_ch = int(self.channel_mult[-1] * mc)
        h = _Res(
            mid_ch, self.dropout, self.use_scale_shift_norm, self.dtype,
            self.use_pallas_gn, fused, train_fused=tfused, name="mid_res0",
        )(h, emb, st, deterministic)
        if fused:
            h, st = h
        h = _Attn(
            self.num_head_channels, self.dtype, self.use_pallas_gn,
            name="mid_attn",
        )(h, st, fused)
        if fused:
            h, st = h
        else:
            st = None
        h = _Res(
            mid_ch, self.dropout, self.use_scale_shift_norm, self.dtype,
            self.use_pallas_gn, fused, train_fused=tfused, name="mid_res1",
        )(h, emb, st, deterministic)
        if fused:
            h, st = h
        h = _tag(h)

        # -- output blocks
        block_idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = int(mult * mc)
            for i in range(self.num_res_blocks + 1):
                skip, skip_st = hs.pop()
                if fused and PERF_SPLIT_SKIP:
                    # the (h, skip) pair travels unconcatenated; the block
                    # splits its norm affine and convolutions per part.
                    # Coerce to a common layout if only one side is padded
                    # (can only differ at a level-transition edge case)
                    if isinstance(h, PaddedStream) != isinstance(
                        skip, PaddedStream
                    ):
                        if isinstance(h, PaddedStream):
                            skip = pad_stream(skip)
                        else:
                            h = pad_stream(h)
                    h_in = (h, skip)
                    st_in = (st, skip_st)
                else:
                    if isinstance(h, PaddedStream):
                        h = unpad_stream(h)
                    if isinstance(skip, PaddedStream):
                        skip = unpad_stream(skip)
                    h_in = jnp.concatenate([h, skip], axis=-1)
                    if st is not None and skip_st is not None:
                        st_in = jnp.concatenate([st, skip_st], axis=-1)
                    else:
                        st_in = None
                h = _Res(
                    ch, self.dropout, self.use_scale_shift_norm, self.dtype,
                    self.use_pallas_gn, fused, train_fused=tfused,
                    name=f"up_res_{block_idx}",
                )(h_in, emb, st_in, deterministic)
                if fused:
                    h, st = h
                if ds in self.attention_resolutions:
                    h = _Attn(
                        self.num_head_channels, self.dtype,
                        self.use_pallas_gn, name=f"up_attn_{block_idx}",
                    )(h, st, fused)
                    if fused:
                        h, st = h
                    else:
                        st = None
                if level and i == self.num_res_blocks:
                    up_hw = hh * ww * 4
                    h = Upsample3D(
                        ch, self.dtype, fused, train_fused=tfused,
                        name=f"upsample_{level}"
                    )(
                        h, want_stats=fused,
                        padded_out=fused
                        and _padded_eligible(ch, [ch], up_hw),
                    )
                    if fused:
                        h, st = h
                    h = _tag(h)
                    hh, ww = hh * 2, ww * 2
                    ds //= 2
                block_idx += 1
        assert not hs

        if isinstance(h, PaddedStream):
            h = unpad_stream(h)
        st2 = jnp.sum(st, axis=1) if st is not None else None
        h = GroupNorm32(
            with_silu=True, use_pallas=self.use_pallas_gn and not fused,
            name="out_norm",
        )(h, stats=st2).astype(self.dtype)
        h = PseudoConv3d(
            self.out_channels, 3, dtype=self.dtype, name="out_conv"
        )(h)
        return h.astype(jnp.float32)
