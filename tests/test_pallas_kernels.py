"""Pallas fused GroupNorm+SiLU: interpreter-mode correctness vs the XLA
reference and vs flax GroupNorm semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2a_tpu.ops.pallas_kernels import (
    fused_group_norm_silu,
    group_norm_silu_reference,
)


@pytest.mark.parametrize("with_silu", [True, False])
def test_fused_gn_matches_reference(with_silu):
    rs = np.random.RandomState(0)
    b, f, h, w, c = 2, 3, 8, 8, 128
    groups = 32
    x = jnp.asarray(rs.randn(b, f, h, w, c), jnp.float32)
    scale = jnp.asarray(rs.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(c) * 0.1, jnp.float32)

    ref = group_norm_silu_reference(x, scale, bias, groups, with_silu=with_silu)
    out = fused_group_norm_silu(
        x, scale, bias, groups, with_silu=with_silu, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_gn_bf16_io_fp32_stats():
    rs = np.random.RandomState(1)
    b, s, c = 2, 64, 256
    x = jnp.asarray(rs.randn(b, s, c), jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    out = fused_group_norm_silu(
        x, scale, bias, groups=32, interpret=True
    )
    assert out.dtype == jnp.bfloat16
    ref = group_norm_silu_reference(x, scale, bias, groups=32)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_fused_gn_matches_flax_groupnorm():
    """Same semantics as flax nn.GroupNorm(eps=1e-5) + silu — the pair the
    kernel replaces inside ResBlock3D."""
    import flax.linen as nn

    rs = np.random.RandomState(2)
    b, f, hw, c = 1, 2, 16, 64
    x = jnp.asarray(rs.randn(b, f, hw, c), jnp.float32)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    params = gn.init(jax.random.PRNGKey(0), x.reshape(b, -1, c))
    scale = params["params"]["scale"]
    bias = params["params"]["bias"]
    want = nn.silu(gn.apply(params, x.reshape(b, -1, c))).reshape(x.shape)
    got = fused_group_norm_silu(x, scale, bias, groups=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chunking_is_shape_invariant():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 48, 128), jnp.float32)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    full = fused_group_norm_silu(x, scale, bias, interpret=True, chunk=48)
    small = fused_group_norm_silu(x, scale, bias, interpret=True, chunk=8)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(small), atol=1e-5
    )


def test_video_unet_pallas_gn_path_matches_default():
    """The use_pallas_gn=True U-Net (interpret mode on CPU) must match the
    plain-XLA path with the same params."""
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 2, 16, 16, 6), jnp.float32)
    t = jnp.asarray([5], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    out1 = VideoUNet(use_pallas_gn=True, **kw).apply(params, x, t, tok)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=2e-5, rtol=1e-4
    )


# -- ResBlock-interior kernels (ops/resblock_kernels.py) ---------------------


def _tconv_inputs(b=2, f=4, h=6, w=8, c=128, seed=0, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, f, h, w, c), dtype)
    kernel = jnp.asarray(rs.randn(3, c, c) * 0.05, jnp.float32)
    bias = jnp.asarray(rs.randn(c) * 0.1, jnp.float32)
    emb = jnp.asarray(rs.randn(b, c) * 0.3, jnp.float32)
    res = jnp.asarray(rs.randn(b, f, h, w, c), dtype)
    return x, kernel, bias, emb, res


def test_temporal_conv_fused_matches_reference():
    from v2a_tpu.ops.resblock_kernels import (
        temporal_conv_fused, temporal_conv_reference,
    )

    x, kernel, bias, emb, res = _tconv_inputs()
    got = temporal_conv_fused(x, kernel, bias, interpret=True)
    want = temporal_conv_reference(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_temporal_conv_fused_matches_flax_conv():
    """The kernel must reproduce the production PseudoConv3d temporal path
    (flax Conv over the frame axis, zero 'SAME' padding)."""
    from flax import linen as nn
    from v2a_tpu.ops.resblock_kernels import temporal_conv_fused

    x, kernel, bias, _, _ = _tconv_inputs(b=1, f=5, h=4, w=4, c=128)
    b, f, h, w, c = x.shape
    conv = nn.Conv(c, (3,), padding=1)
    params = {"params": {"kernel": kernel, "bias": bias}}
    xt = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
    want = (
        conv.apply(params, xt)
        .reshape(b, h, w, f, c)
        .transpose(0, 3, 1, 2, 4)
    )
    got = temporal_conv_fused(x, kernel, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4
    )


def test_temporal_conv_fused_emb_residual_stats():
    from v2a_tpu.ops.resblock_kernels import (
        temporal_conv_fused, temporal_conv_reference,
    )

    x, kernel, bias, emb, res = _tconv_inputs(b=2, f=3, h=4, w=8, c=128)
    got, stats = temporal_conv_fused(
        x, kernel, bias, emb=emb, residual=res, want_stats=True,
        interpret=True,
    )
    want = temporal_conv_reference(x, kernel, bias, emb=emb, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # stats = per-(B, F, C) sum / sumsq over the spatial positions
    yf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(stats[:, :, 0]), yf.sum(axis=(2, 3)), rtol=1e-5, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(stats[:, :, 1]), (yf * yf).sum(axis=(2, 3)),
        rtol=1e-5, atol=1e-3,
    )


def test_temporal_conv_fused_tile_independent():
    from v2a_tpu.ops.resblock_kernels import temporal_conv_fused

    x, kernel, bias, emb, _ = _tconv_inputs(b=1, f=3, h=4, w=8, c=128)
    full = temporal_conv_fused(x, kernel, bias, emb=emb, interpret=True,
                               tile=32)
    small = temporal_conv_fused(x, kernel, bias, emb=emb, interpret=True,
                                tile=4)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(small), atol=1e-5
    )


def test_stats_to_group_affine_reproduces_group_norm():
    """GN(h)*scale+bias computed via the folded per-channel affine must equal
    the direct GroupNorm, for stats aggregated over frames."""
    from v2a_tpu.ops.pallas_kernels import group_norm_silu_reference
    from v2a_tpu.ops.resblock_kernels import stats_to_group_affine

    rs = np.random.RandomState(3)
    b, f, h, w, c, g = 2, 3, 4, 4, 128, 32
    x = jnp.asarray(rs.randn(b, f, h, w, c), jnp.float32)
    scale = jnp.asarray(rs.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(c), jnp.float32)

    xf = np.asarray(x, np.float32)
    stats = jnp.asarray(
        np.stack(
            [xf.sum(axis=(1, 2, 3)), (xf * xf).sum(axis=(1, 2, 3))], axis=1
        )
    )  # (B, 2, C)
    a, bshift = stats_to_group_affine(stats, scale, bias,
                                      n_per_channel=f * h * w, groups=g)
    got = x * a[:, None, None, None, :] + bshift[:, None, None, None, :]
    want = group_norm_silu_reference(
        x, scale, bias, groups=g, with_silu=False
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_video_unet_fused_path_matches_default():
    """fused=True (Pallas ResBlock interior, interpret mode on CPU) must
    match the plain path with the same params — same param tree, same math.
    Channels are 128-multiples so the fused kernel actually engages."""
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 2, 8, 8, 6), jnp.float32)
    t = jnp.asarray([5], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    fused = VideoUNet(fused=True, **kw)
    params_fused = jax.eval_shape(
        lambda r: fused.init(r, x, t, tok), jax.random.PRNGKey(0)
    )
    assert (
        jax.tree_util.tree_structure(params)
        == jax.tree_util.tree_structure(params_fused)
    ), "fused path must keep the parameter tree identical"
    out0 = base.apply(params, x, t, tok)
    out1 = fused.apply(params, x, t, tok)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=5e-4, rtol=1e-3
    )


def test_video_unet_fused_scale_shift_matches_default():
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64, use_scale_shift_norm=True,
    )
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 2, 8, 8, 6), jnp.float32)
    t = jnp.asarray([9], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    out1 = VideoUNet(fused=True, **kw).apply(params, x, t, tok)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=5e-4, rtol=1e-3
    )


def test_video_unet_fused_xla2d_tconv_matches_default():
    """PERF_TCONV_XLA2D_MIN_S routes the fused temporal conv through an XLA
    (k,1)-kernel 2D convolution over the (B, F, H*W, C) view (zero Pallas
    boundaries, so no relayout fusions on TPU) — must match the plain path
    with the same params, including the stats-forwarding chain."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 2, 8, 8, 6), jnp.float32)
    t = jnp.asarray([5], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    saved = video_unet.PERF_TCONV_XLA2D_MIN_S
    video_unet.PERF_TCONV_XLA2D_MIN_S = 1
    try:
        out1 = VideoUNet(fused=True, **kw).apply(params, x, t, tok)
    finally:
        video_unet.PERF_TCONV_XLA2D_MIN_S = saved
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=5e-4, rtol=1e-3
    )


def test_video_unet_spatial2_path_matches_default():
    """PERF_PALLAS_SPATIAL2_MIN_CH routes deep-level 3x3 convs through the
    fused affine+SiLU im2col kernel (interpret mode on CPU) — must match the
    plain path, incl. the split-skip up blocks and the Upsample conv."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(1, 2, 8, 8, 6), jnp.float32)
    t = jnp.asarray([5], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    saved = video_unet.PERF_PALLAS_SPATIAL2_MIN_CH
    video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 128
    try:
        fused = VideoUNet(fused=True, **kw)
        params_fused = jax.eval_shape(
            lambda r: fused.init(r, x, t, tok), jax.random.PRNGKey(0)
        )
        assert (
            jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused)
        ), "spatial2 path must keep the parameter tree identical"
        out1 = fused.apply(params, x, t, tok)
    finally:
        video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = saved
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=5e-4, rtol=1e-3
    )


def test_video_unet_spatial2_banded_matches_default():
    """MAX_S raised: 32x32 resblocks route through the banded kernel inside
    the full model (fused + stats-forwarding + split-skip interplay)."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(1, 2, 32, 32, 6), jnp.float32)
    t = jnp.asarray([3], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    saved = (
        video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
        video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
    )
    video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 128
    video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 16384
    try:
        out1 = VideoUNet(fused=True, **kw).apply(params, x, t, tok)
    finally:
        (
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
        ) = saved
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=5e-4, rtol=1e-3
    )


def test_fused_affine_conv3x3_padded_matches_reference():
    """The padded-stream conv: garbage pad values must be masked, the
    output border zeroed, multi-part (split concat) summed, and every
    band position (first/middle/last row shift) exact."""
    from flax import linen as nn
    from v2a_tpu.ops.resblock_kernels import (
        fused_affine_conv3x3_padded, padded_hw,
    )

    rs = np.random.RandomState(3)
    n, h, w, d = 2, 8, 8, 16
    cins = [8, 16]
    hp, wp = padded_hw(h, w)
    parts, ref = [], None
    for ci in cins:
        x = rs.randn(n, h, w, ci).astype(np.float32)
        k = (rs.randn(3, 3, ci, d) * 0.1).astype(np.float32)
        a = (1 + 0.1 * rs.randn(n, ci)).astype(np.float32)
        b = (0.1 * rs.randn(n, ci)).astype(np.float32)
        xp = np.full((n, hp, wp, ci), 9.9, np.float32)  # garbage pads
        xp[:, 1:h + 1, 1:w + 1, :] = x
        parts.append((jnp.asarray(xp), jnp.asarray(k), jnp.asarray(a),
                      jnp.asarray(b)))
        xa = x * a[:, None, None, :] + b[:, None, None, :]
        xa = xa * jax.nn.sigmoid(jnp.asarray(xa))
        y = nn.Conv(d, (3, 3), padding=1).apply(
            {"params": {"kernel": jnp.asarray(k), "bias": jnp.zeros(d)}},
            jnp.asarray(xa),
        )
        ref = y if ref is None else ref + y
    bias = jnp.asarray(rs.randn(d).astype(np.float32) * 0.1)
    ref = ref + bias

    for tile_h in (2, 4):  # H=8: multiple band layouts
        got = fused_affine_conv3x3_padded(
            parts, bias, (h, w), silu=True, tile_h=tile_h, interpret=True
        )
        assert got.shape == (n, hp, wp, d)
        np.testing.assert_allclose(
            np.asarray(got)[:, 1:h + 1, 1:w + 1, :], np.asarray(ref),
            atol=1e-4,
        )
        # layout contract: pad COLS zero; pad ROWS unwritten (garbage)
        cols = np.asarray(got)[:, 1:h + 1, :, :].copy()
        cols[:, :, 1:w + 1, :] = 0
        assert np.abs(cols).max() == 0.0


def test_temporal_conv_padded_matches_reference():
    """The padded-stream temporal conv: row-banded blocks skip garbage pad
    rows, col pads come out zero, and the emitted stats are exact interior
    sum/sumsq (vs the plain reference on the interior)."""
    from v2a_tpu.ops.resblock_kernels import (
        padded_hw, temporal_conv_padded, temporal_conv_reference,
    )

    rs = np.random.RandomState(5)
    b, f, h, w, c = 2, 3, 8, 8, 8
    hp, wp = padded_hw(h, w)
    x = rs.randn(b, f, h, w, c).astype(np.float32)
    kernel = (rs.randn(3, c, c) * 0.2).astype(np.float32)
    bias = (rs.randn(c) * 0.1).astype(np.float32)
    emb = (rs.randn(b, c) * 0.5).astype(np.float32)
    res = rs.randn(b, f, h, w, c).astype(np.float32)

    # padded layout: garbage ROWS, zero COLS (the producer contract)
    def to_padded(u):
        p = np.zeros((b, f, hp, wp, c), np.float32)
        p[:, :, 0] = 5.5
        p[:, :, -1] = -4.4
        p[:, :, 1:h + 1, 1:w + 1] = u
        return jnp.asarray(p)

    xp = to_padded(x)
    rp = to_padded(res)
    got, stats = temporal_conv_padded(
        xp, jnp.asarray(kernel), jnp.asarray(bias), (h, w),
        emb=jnp.asarray(emb), residual=rp, want_stats=True,
        interpret=True, tile_r=4,
    )
    want = temporal_conv_reference(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias)
    ) + emb[:, None, None, None, :] + res
    gotn = np.asarray(got)
    np.testing.assert_allclose(
        gotn[:, :, 1:h + 1, 1:w + 1], np.asarray(want), atol=1e-4
    )
    # col pads exactly zero on interior rows
    cols = gotn[:, :, 1:h + 1].copy()
    cols[:, :, :, 1:w + 1] = 0
    assert np.abs(cols).max() == 0.0
    # stats are exact interior statistics
    wf = np.asarray(
        gotn[:, :, 1:h + 1, 1:w + 1], np.float32
    )
    np.testing.assert_allclose(
        np.asarray(stats)[:, :, 0], wf.sum(axis=(2, 3)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats)[:, :, 1], (wf * wf).sum(axis=(2, 3)), rtol=1e-5
    )


def test_video_unet_padded_stream_matches_default():
    """PERF_PADDED_STREAM keeps the banded levels in (B,F,Hp,Wp,C) padded
    layout end-to-end (pad-corrected tconv stats, padded split-skip blocks,
    padded Upsample conv, 1x1 skip pv tracking) — must match the plain
    path on the full model."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(13)
    x = jnp.asarray(rs.randn(1, 2, 32, 32, 6), jnp.float32)
    t = jnp.asarray([3], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    saved = (
        video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
        video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
        video_unet.PERF_PADDED_STREAM,
    )
    video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 128
    video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 16384
    video_unet.PERF_PADDED_STREAM = True
    try:
        fused = VideoUNet(fused=True, **kw)
        params_fused = jax.eval_shape(
            lambda r: fused.init(r, x, t, tok), jax.random.PRNGKey(0)
        )
        assert (
            jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused)
        ), "padded stream must keep the parameter tree identical"
        out1 = fused.apply(params, x, t, tok)
    finally:
        (
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
            video_unet.PERF_PADDED_STREAM,
        ) = saved
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=5e-4, rtol=1e-3
    )


def test_fused_conv_tconv_padded_matches_two_kernel_path():
    """The conv+tconv mega-kernel must reproduce the two-kernel padded
    path exactly (same tap order, same bf16 rounding points)."""
    from v2a_tpu.ops.resblock_kernels import (
        fused_affine_conv3x3_padded, fused_conv_tconv_padded, padded_hw,
        temporal_conv_padded,
    )

    rs = np.random.RandomState(4)
    b, f, h, w, d = 2, 3, 8, 8, 16
    cins = [8, 16]
    hp, wp = padded_hw(h, w)
    parts = []
    for ci in cins:
        x = np.zeros((b, f, hp, wp, ci), np.float32)
        x[:, :, 0] = 3.3
        x[:, :, -1] = -2.2  # garbage pad rows
        x[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, ci)
        k = (rs.randn(3, 3, ci, d) * 0.1).astype(np.float32)
        a = (1 + 0.1 * rs.randn(b * f, ci)).astype(np.float32)
        bb = (0.1 * rs.randn(b * f, ci)).astype(np.float32)
        parts.append((jnp.asarray(x), jnp.asarray(k), jnp.asarray(a),
                      jnp.asarray(bb)))
    kbias = jnp.asarray(rs.randn(d).astype(np.float32) * 0.1)
    tk = jnp.asarray((rs.randn(3, d, d) * 0.2).astype(np.float32))
    tb = jnp.asarray((rs.randn(d) * 0.1).astype(np.float32))
    emb = jnp.asarray((rs.randn(b, d) * 0.5).astype(np.float32))
    res = np.zeros((b, f, hp, wp, d), np.float32)
    res[:, :, 0] = 9.9
    res[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, d)
    res = jnp.asarray(res)

    flat = [
        (p.reshape(b * f, hp, wp, c), k, a, bb)
        for (p, k, a, bb), c in zip(parts, cins)
    ]
    y = fused_affine_conv3x3_padded(flat, kbias, (h, w), silu=True,
                                    interpret=True)
    want, wstats = temporal_conv_padded(
        y.reshape(b, f, hp, wp, d), tk, tb, (h, w), emb=emb, residual=res,
        want_stats=True, interpret=True,
    )
    got, gstats = fused_conv_tconv_padded(
        parts, kbias, tk, tb, (h, w), emb=emb, residual=res, silu=True,
        want_stats=True, interpret=True, tile_h=4,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 1:h + 1, 1:w + 1],
        np.asarray(want)[:, :, 1:h + 1, 1:w + 1], atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gstats), np.asarray(wstats), rtol=1e-5, atol=1e-4
    )
    cols = np.asarray(got)[:, :, 1:h + 1].copy()
    cols[:, :, :, 1:w + 1] = 0
    assert np.abs(cols).max() == 0.0


def test_fused_upconv3x3_padded_matches_resize_conv():
    """The collapsed 4-parity upsample conv == nearest-2x then SAME conv,
    including the hi-res zero halo reproduced from masked lo pads."""
    from flax import linen as nn
    from v2a_tpu.ops.resblock_kernels import (
        fused_upconv3x3_padded, padded_hw,
    )

    rs = np.random.RandomState(6)
    n, h, w, c, d = 3, 8, 8, 8, 16
    hp, wp = padded_hw(h, w)
    x = rs.randn(n, h, w, c).astype(np.float32)
    xp = np.zeros((n, hp, wp, c), np.float32)
    xp[:, 0] = 7.0
    xp[:, -1] = -7.0  # garbage pad rows
    xp[:, 1:h + 1, 1:w + 1] = x
    k = (rs.randn(3, 3, c, d) * 0.1).astype(np.float32)
    bias = (rs.randn(d) * 0.1).astype(np.float32)

    xu = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    ref = nn.Conv(d, (3, 3), padding=1).apply(
        {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(bias)}},
        jnp.asarray(xu),
    )
    for tl in (2, 4):
        got = fused_upconv3x3_padded(
            jnp.asarray(xp), jnp.asarray(k), jnp.asarray(bias), (h, w),
            tile_h=tl, interpret=True,
        )
        gi = np.asarray(got)[:, 1:2 * h + 1, 1:2 * w + 1]
        np.testing.assert_allclose(gi, np.asarray(ref), atol=1e-4)
        cols = np.asarray(got)[:, 1:2 * h + 1].copy()
        cols[:, :, 1:2 * w + 1] = 0
        assert np.abs(cols).max() == 0.0


def test_video_unet_upconv_matches_default():
    """PERF_UPCONV routes the padded Upsample convs through the collapsed
    parity kernel inside the full model — must match the plain path."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(17)
    x = jnp.asarray(rs.randn(1, 2, 32, 32, 6), jnp.float32)
    t = jnp.asarray([9], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    saved = (
        video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
        video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
        video_unet.PERF_PADDED_STREAM,
        video_unet.PERF_UPCONV,
    )
    video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 128
    video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 16384
    video_unet.PERF_PADDED_STREAM = True
    video_unet.PERF_UPCONV = True
    try:
        out1 = VideoUNet(fused=True, **kw).apply(params, x, t, tok)
    finally:
        (
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
            video_unet.PERF_PADDED_STREAM,
            video_unet.PERF_UPCONV,
        ) = saved
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=5e-4, rtol=1e-3
    )


def test_fused_conv_tconv_stream_matches_mega():
    """The frame-streaming mega-kernel (frame axis on the grid, 3-slot
    conv ring in persistent scratch) must match the all-frames form."""
    from v2a_tpu.ops.resblock_kernels import (
        fused_conv_tconv_padded, fused_conv_tconv_stream, padded_hw,
    )

    rs = np.random.RandomState(4)
    b, f, h, w, d = 2, 4, 8, 8, 16
    cins = [8, 16]
    hp, wp = padded_hw(h, w)
    parts = []
    for ci in cins:
        x = np.zeros((b, f, hp, wp, ci), np.float32)
        x[:, :, 0] = 3.3
        x[:, :, -1] = -2.2
        x[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, ci)
        k = (rs.randn(3, 3, ci, d) * 0.1).astype(np.float32)
        a = (1 + 0.1 * rs.randn(b * f, ci)).astype(np.float32)
        bb = (0.1 * rs.randn(b * f, ci)).astype(np.float32)
        parts.append((jnp.asarray(x), jnp.asarray(k), jnp.asarray(a),
                      jnp.asarray(bb)))
    kbias = jnp.asarray(rs.randn(d).astype(np.float32) * 0.1)
    tk = jnp.asarray((rs.randn(3, d, d) * 0.2).astype(np.float32))
    tb = jnp.asarray((rs.randn(d) * 0.1).astype(np.float32))
    emb = jnp.asarray((rs.randn(b, d) * 0.5).astype(np.float32))
    res = np.zeros((b, f, hp, wp, d), np.float32)
    res[:, :, 0] = 9.9
    res[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, d)
    res = jnp.asarray(res)

    want, wstats = fused_conv_tconv_padded(
        parts, kbias, tk, tb, (h, w), emb=emb, residual=res, silu=True,
        want_stats=True, interpret=True, tile_h=4,
    )
    got, gstats = fused_conv_tconv_stream(
        parts, kbias, tk, tb, (h, w), emb=emb, residual=res, silu=True,
        want_stats=True, interpret=True, tile_h=4,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 1:h + 1, 1:w + 1],
        np.asarray(want)[:, :, 1:h + 1, 1:w + 1], atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gstats), np.asarray(wstats), rtol=1e-5, atol=1e-4
    )


def test_fused_conv_tconv_dma_matches_mega():
    """The manual double-buffered-DMA mega variant (HBM refs + explicit
    async copies, pallas-guide pattern) must match the BlockSpec form,
    including skip folding and stats."""
    from v2a_tpu.ops.resblock_kernels import (
        fused_conv_tconv_dma, fused_conv_tconv_padded, padded_hw,
    )

    rs = np.random.RandomState(4)
    b, f, h, w, d = 2, 3, 8, 8, 16
    cins = [8, 16]
    hp, wp = padded_hw(h, w)
    parts = []
    for ci in cins:
        x = np.zeros((b, f, hp, wp, ci), np.float32)
        x[:, :, 0] = 3.3
        x[:, :, -1] = -2.2
        x[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, ci)
        k = (rs.randn(3, 3, ci, d) * 0.1).astype(np.float32)
        a = (1 + 0.1 * rs.randn(b * f, ci)).astype(np.float32)
        bb = (0.1 * rs.randn(b * f, ci)).astype(np.float32)
        parts.append((jnp.asarray(x), jnp.asarray(k), jnp.asarray(a),
                      jnp.asarray(bb)))
    kbias = jnp.asarray(rs.randn(d).astype(np.float32) * 0.1)
    tk = jnp.asarray((rs.randn(3, d, d) * 0.2).astype(np.float32))
    tb = jnp.asarray((rs.randn(d) * 0.1).astype(np.float32))
    emb = jnp.asarray((rs.randn(b, d) * 0.5).astype(np.float32))
    xs = np.zeros((b, f, hp, wp, 16), np.float32)
    xs[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, 16)
    sparts = [(jnp.asarray(xs),
               jnp.asarray((rs.randn(16, d) * 0.1).astype(np.float32)))]
    sbias = jnp.asarray((rs.randn(d) * 0.1).astype(np.float32))

    want, wstats = fused_conv_tconv_padded(
        parts, kbias, tk, tb, (h, w), emb=emb, skip_parts=sparts,
        skip_bias=sbias, silu=True, want_stats=True, interpret=True,
        tile_h=4,
    )
    got, gstats = fused_conv_tconv_dma(
        parts, kbias, tk, tb, (h, w), emb=emb, skip_parts=sparts,
        skip_bias=sbias, silu=True, want_stats=True, interpret=True,
        tile_h=4,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 1:h + 1, 1:w + 1],
        np.asarray(want)[:, :, 1:h + 1, 1:w + 1], atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gstats), np.asarray(wstats), rtol=1e-5, atol=1e-4
    )


def test_fused_downconv3x3_padded_matches_strided_conv():
    """The padded-stream stride-2 conv (row-pair/column-parity splits)
    must equal XLA's strided SAME conv, with garbage pad rows masked."""
    from v2a_tpu.ops.resblock_kernels import (
        fused_downconv3x3_padded, padded_hw,
    )

    rs = np.random.RandomState(8)
    n, h, w, c, d = 3, 8, 8, 8, 16
    hp, wp = padded_hw(h, w)
    x = rs.randn(n, h, w, c).astype(np.float32)
    xp = np.zeros((n, hp, wp, c), np.float32)
    xp[:, 0] = 6.0
    xp[:, -1] = -6.0
    xp[:, 1:h + 1, 1:w + 1] = x
    k = (rs.randn(3, 3, c, d) * 0.1).astype(np.float32)
    bias = (rs.randn(d) * 0.1).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    for tl in (2, 4):
        got = fused_downconv3x3_padded(
            jnp.asarray(xp), jnp.asarray(k), jnp.asarray(bias), (h, w),
            tile_h=tl, interpret=True,
        )
        gi = np.asarray(got)[:, 1:h // 2 + 1, 1:w // 2 + 1]
        np.testing.assert_allclose(gi, np.asarray(ref), atol=1e-4)
        cols = np.asarray(got)[:, 1:h // 2 + 1].copy()
        cols[:, :, 1:w // 2 + 1] = 0
        assert np.abs(cols).max() == 0.0


def test_video_unet_downconv_matches_default():
    """PERF_DOWNCONV routes the Downsample through the padded stride-2
    kernel inside the full model (64^2 input so the post-downsample level
    is still banded-eligible) — must match the plain path."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64,
    )
    rs = np.random.RandomState(19)
    x = jnp.asarray(rs.randn(1, 2, 64, 64, 6), jnp.float32)
    t = jnp.asarray([7], jnp.int32)
    tok = jnp.asarray(rs.randn(1, 4, 64), jnp.float32)

    base = VideoUNet(**kw)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    out0 = base.apply(params, x, t, tok)
    saved = (
        video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
        video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
        video_unet.PERF_PADDED_STREAM,
        video_unet.PERF_DOWNCONV,
    )
    video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 128
    video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 16384
    video_unet.PERF_PADDED_STREAM = True
    video_unet.PERF_DOWNCONV = True
    try:
        out1 = VideoUNet(fused=True, **kw).apply(params, x, t, tok)
    finally:
        (
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH,
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
            video_unet.PERF_PADDED_STREAM,
            video_unet.PERF_DOWNCONV,
        ) = saved
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=1e-3, rtol=1e-3
    )


def test_temporal_conv_fused_hw_matches_reference():
    from v2a_tpu.ops.resblock_kernels import (
        temporal_conv_fused_hw, temporal_conv_reference,
    )

    x, kernel, bias, emb, res = _tconv_inputs(b=2, f=3, h=4, w=8, c=128)
    got, stats = temporal_conv_fused_hw(
        x, kernel, bias, emb=emb, residual=res, want_stats=True,
        interpret=True,
    )
    want = temporal_conv_reference(x, kernel, bias, emb=emb, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    yf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(stats[:, :, 0]), yf.sum(axis=(2, 3)), rtol=1e-5, atol=1e-3
    )
    got2 = temporal_conv_fused_hw(x, kernel, bias, interpret=True, tile=4)
    want2 = temporal_conv_reference(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-4)


def test_fused_affine_conv3x3_matches_reference():
    """The deep-level affine+SiLU+3x3-conv kernel vs flax Conv + manual
    affine, incl. the padded-border re-zeroing under the affine."""
    from flax import linen as nn
    from v2a_tpu.ops.resblock_kernels import fused_affine_conv3x3

    rs = np.random.RandomState(0)
    n, h, w, c, d = 4, 8, 8, 128, 128
    x = jnp.asarray(rs.randn(n, h, w, c), jnp.float32)
    kernel = jnp.asarray(rs.randn(3, 3, c, d) * 0.05, jnp.float32)
    bias = jnp.asarray(rs.randn(d) * 0.1, jnp.float32)
    a = jnp.asarray(rs.rand(n, c) + 0.5, jnp.float32)
    b = jnp.asarray(rs.randn(n, c) * 0.1, jnp.float32)

    conv = nn.Conv(d, (3, 3), padding=1)
    params = {"params": {"kernel": kernel, "bias": bias}}

    # plain conv (no affine)
    got = fused_affine_conv3x3(x, kernel, bias, interpret=True)
    want = conv.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # affine + SiLU + conv
    xa = x * a[:, None, None, :] + b[:, None, None, :]
    xa = xa * jax.nn.sigmoid(xa)
    want2 = conv.apply(params, xa)
    got2 = fused_affine_conv3x3(x, kernel, bias, a=a, b=b, silu=True,
                                interpret=True)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), atol=1e-4
    )

    # grouping must not change results
    got3 = fused_affine_conv3x3(x, kernel, bias, a=a, b=b, silu=True,
                                group=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got3), np.asarray(want2), atol=1e-4
    )


def test_fused_affine_conv3x3_banded_matches_reference():
    """The large-level (H*W > 512) dispatch: halo'd Element-indexed row
    bands, 9 per-tap dots — vs flax Conv + manual affine."""
    from flax import linen as nn
    from v2a_tpu.ops.resblock_kernels import fused_affine_conv3x3

    rs = np.random.RandomState(1)
    n, h, w, c, d = 2, 32, 32, 128, 128  # h*w = 1024 -> banded path
    x = jnp.asarray(rs.randn(n, h, w, c), jnp.float32)
    kernel = jnp.asarray(rs.randn(3, 3, c, d) * 0.05, jnp.float32)
    bias = jnp.asarray(rs.randn(d) * 0.1, jnp.float32)
    a = jnp.asarray(rs.rand(n, c) + 0.5, jnp.float32)
    b = jnp.asarray(rs.randn(n, c) * 0.1, jnp.float32)

    conv = nn.Conv(d, (3, 3), padding=1)
    params = {"params": {"kernel": kernel, "bias": bias}}

    xa = x * a[:, None, None, :] + b[:, None, None, :]
    xa = xa * jax.nn.sigmoid(xa)
    want = conv.apply(params, xa)
    got = fused_affine_conv3x3(x, kernel, bias, a=a, b=b, silu=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # plain (no affine) + explicit band size
    want2 = conv.apply(params, x)
    got2 = fused_affine_conv3x3(x, kernel, bias, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-4)


def test_spatial_conv3x3_matches_flax_conv():
    from flax import linen as nn
    from v2a_tpu.ops.resblock_kernels import spatial_conv3x3

    rs = np.random.RandomState(0)
    n, h, w, c, d = 3, 8, 16, 128, 128
    x = jnp.asarray(rs.randn(n, h, w, c), jnp.float32)
    kernel = jnp.asarray(rs.randn(3, 3, c, d) * 0.05, jnp.float32)
    bias = jnp.asarray(rs.randn(d) * 0.1, jnp.float32)
    conv = nn.Conv(d, (3, 3), padding=1)
    want = conv.apply({"params": {"kernel": kernel, "bias": bias}}, x)

    got = spatial_conv3x3(x, kernel, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    got2 = spatial_conv3x3(x, kernel, bias, interpret=True, tile_h=4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize(
    "mode", ["t", "ts", "d", "tsd", "f", "fd", "fdts", "g", "gd", "gdts"]
)
def test_tapjoin_variants_match_baseline(mode, monkeypatch):
    """Every V2A_TAPJOIN wide-dot restructuring must reproduce the
    per-tap-dot baseline exactly (mega kernel AND the padded temporal
    conv, with skip folding, emb, residual, and stats)."""
    from v2a_tpu.ops import resblock_kernels as rbk

    rs = np.random.RandomState(11)
    b, f, h, w, d = 2, 3, 8, 8, 16
    cins = [8, 16]
    hp, wp = rbk.padded_hw(h, w)
    parts = []
    for ci in cins:
        x = np.zeros((b, f, hp, wp, ci), np.float32)
        x[:, :, 0] = 3.3
        x[:, :, -1] = -2.2  # garbage pad rows
        x[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, ci)
        k = (rs.randn(3, 3, ci, d) * 0.1).astype(np.float32)
        a = (1 + 0.1 * rs.randn(b * f, ci)).astype(np.float32)
        bb = (0.1 * rs.randn(b * f, ci)).astype(np.float32)
        parts.append((jnp.asarray(x), jnp.asarray(k), jnp.asarray(a),
                      jnp.asarray(bb)))
    kbias = jnp.asarray(rs.randn(d).astype(np.float32) * 0.1)
    tk = jnp.asarray((rs.randn(3, d, d) * 0.2).astype(np.float32))
    tb = jnp.asarray((rs.randn(d) * 0.1).astype(np.float32))
    emb = jnp.asarray((rs.randn(b, d) * 0.5).astype(np.float32))
    res = np.zeros((b, f, hp, wp, d), np.float32)
    res[:, :, 0] = 9.9
    res[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, d)
    res = jnp.asarray(res)
    xs = np.zeros((b, f, hp, wp, 16), np.float32)
    xs[:, :, 1:h + 1, 1:w + 1] = rs.randn(b, f, h, w, 16)
    sparts = [(jnp.asarray(xs),
               jnp.asarray((rs.randn(16, d) * 0.1).astype(np.float32)))]
    sbias = jnp.asarray((rs.randn(d) * 0.1).astype(np.float32))

    def run_mega():
        return rbk.fused_conv_tconv_padded(
            parts, kbias, tk, tb, (h, w), emb=emb, skip_parts=sparts,
            skip_bias=sbias, silu=True, want_stats=True, interpret=True,
            tile_h=4,
        )

    def run_tconv():
        return rbk.temporal_conv_padded(
            res, tk, tb, (h, w), emb=emb, skip_parts=sparts,
            skip_bias=sbias, want_stats=True, interpret=True, tile_r=4,
        )

    monkeypatch.setattr(rbk, "TAPJOIN", "")
    want_m, wstats_m = run_mega()
    want_t, wstats_t = run_tconv()
    monkeypatch.setattr(rbk, "TAPJOIN", mode)
    got_m, gstats_m = run_mega()
    got_t, gstats_t = run_tconv()

    interior = np.s_[:, :, 1:h + 1, 1:w + 1]
    np.testing.assert_allclose(
        np.asarray(got_m)[interior], np.asarray(want_m)[interior], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gstats_m), np.asarray(wstats_m), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_t)[interior], np.asarray(want_t)[interior], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gstats_t), np.asarray(wstats_t), rtol=1e-5, atol=1e-4
    )


def test_fused_spatial_attention_padded_matches_block():
    """The one-kernel padded attention == the XLA SpatialAttentionBlock on
    the same params, with garbage pads masked and exact output stats."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import (
        PaddedStream, SpatialAttentionBlock, pad_stream, unpad_stream,
    )
    from v2a_tpu.ops.resblock_kernels import padded_hw

    b, f, h, w, c, ch = 2, 3, 8, 8, 64, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    xf = np.asarray(x, np.float64).reshape(b, f, h * w, c)
    stats = jnp.asarray(np.stack(
        [xf.sum(axis=2), (xf * xf).sum(axis=2)], axis=2
    ).astype(np.float32))

    block = SpatialAttentionBlock(num_head_channels=ch)
    old = video_unet.PERF_PALLAS_ATTN
    video_unet.PERF_PALLAS_ATTN = False
    try:
        params = block.init(jax.random.PRNGKey(1), x, stats=stats)
        ref, ref_stats = block.apply(params, x, stats=stats, want_stats=True)
    finally:
        video_unet.PERF_PALLAS_ATTN = old

    # poison the pad positions to prove in-kernel masking
    ps = pad_stream(x)
    hp, wp = padded_hw(h, w)
    poisoned = ps.x + 1e3
    poisoned = poisoned.at[:, :, 1:h + 1, 1:w + 1, :].set(
        ps.x[:, :, 1:h + 1, 1:w + 1, :]
    )
    ps = PaddedStream(poisoned, (h, w))

    old = video_unet.PERF_PALLAS_ATTN
    video_unet.PERF_PALLAS_ATTN = True
    try:
        out, out_stats = block.apply(params, ps, stats=stats, want_stats=True)
    finally:
        video_unet.PERF_PALLAS_ATTN = old

    assert isinstance(out, PaddedStream)
    np.testing.assert_allclose(
        np.asarray(unpad_stream(out)), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    # every pad position is zeroed (stricter than the garbage-row contract)
    full = np.asarray(out.x)
    interior_mask = np.zeros((hp, wp), bool)
    interior_mask[1:h + 1, 1:w + 1] = True
    assert np.all(full[:, :, ~interior_mask, :] == 0.0)
    # emitted stats are the interior statistics of the output
    np.testing.assert_allclose(
        np.asarray(out_stats), np.asarray(ref_stats), atol=5e-3, rtol=5e-4
    )


def test_fused_spatial_attention_survives_nan_pads():
    """Pad rows can be NaN (the stride-2 downconv producer never writes
    them; interpret mode fills them with NaN). The round-3 regression:
    additive key masks (`logits + -1e30`) and multiplicative zeroing
    (`y * mask`) both PRESERVE NaN, poisoning every interior query via
    the softmax. The kernel must select pads away (`jnp.where`)."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import (
        PaddedStream, SpatialAttentionBlock, pad_stream, unpad_stream,
    )

    b, f, h, w, c, ch = 1, 2, 8, 8, 64, 32
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    xf = np.asarray(x, np.float64).reshape(b, f, h * w, c)
    stats = jnp.asarray(np.stack(
        [xf.sum(axis=2), (xf * xf).sum(axis=2)], axis=2
    ).astype(np.float32))

    block = SpatialAttentionBlock(num_head_channels=ch)
    old = video_unet.PERF_PALLAS_ATTN
    video_unet.PERF_PALLAS_ATTN = False
    try:
        params = block.init(jax.random.PRNGKey(1), x, stats=stats)
        ref = block.apply(params, x, stats=stats)
    finally:
        video_unet.PERF_PALLAS_ATTN = old

    ps = pad_stream(x)
    poisoned = jnp.full_like(ps.x, jnp.nan)
    poisoned = poisoned.at[:, :, 1:h + 1, 1:w + 1, :].set(
        ps.x[:, :, 1:h + 1, 1:w + 1, :]
    )
    ps = PaddedStream(poisoned, (h, w))

    old = video_unet.PERF_PALLAS_ATTN
    video_unet.PERF_PALLAS_ATTN = True
    try:
        out = block.apply(params, ps, stats=stats)
    finally:
        video_unet.PERF_PALLAS_ATTN = old

    got = np.asarray(unpad_stream(out))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4, rtol=2e-4)
    # pads come out zeroed even when they went in as NaN
    assert np.all(np.nan_to_num(np.asarray(out.x), nan=-1.0)[:, :, 0, :, :] == 0.0)


def test_fused_spatial_attention_nonsquare_and_heads():
    """640-channel 20-head case (the L4 shape class) at a non-square hw."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import (
        SpatialAttentionBlock, pad_stream, unpad_stream,
    )

    b, f, h, w, c, ch = 1, 2, 4, 8, 96, 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    xf = np.asarray(x, np.float64).reshape(b, f, h * w, c)
    stats = jnp.asarray(np.stack(
        [xf.sum(axis=2), (xf * xf).sum(axis=2)], axis=2
    ).astype(np.float32))

    block = SpatialAttentionBlock(num_head_channels=ch)
    old = video_unet.PERF_PALLAS_ATTN
    video_unet.PERF_PALLAS_ATTN = False
    try:
        params = block.init(jax.random.PRNGKey(1), x, stats=stats)
        ref = block.apply(params, x, stats=stats)
    finally:
        video_unet.PERF_PALLAS_ATTN = old

    old = video_unet.PERF_PALLAS_ATTN
    video_unet.PERF_PALLAS_ATTN = True
    try:
        out = block.apply(params, pad_stream(x), stats=stats)
    finally:
        video_unet.PERF_PALLAS_ATTN = old
    np.testing.assert_allclose(
        np.asarray(unpad_stream(out)), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_fused_spatial_attention_unpadded_entry():
    """Round-3 regression: attention lives at ds 8/16 where the stream is
    NEVER padded (hw <= 512 fails _padded_eligible), so the kernel must
    fire from a PLAIN (B, F, H, W, C) input via the local pad_stream entry
    — without it, V2A_PALLAS_ATTN was a silent no-op on the shipped
    config. Kernel-entered output must match the XLA block exactly
    (same params, same stats), including the forwarded output stats."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import SpatialAttentionBlock

    b, f, h, w, c, ch = 2, 2, 8, 8, 64, 32
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    xf = np.asarray(x, np.float64).reshape(b, f, h * w, c)
    stats = jnp.asarray(np.stack(
        [xf.sum(axis=2), (xf * xf).sum(axis=2)], axis=2
    ).astype(np.float32))

    block = SpatialAttentionBlock(num_head_channels=ch)
    old = video_unet.PERF_PALLAS_ATTN
    video_unet.PERF_PALLAS_ATTN = False
    try:
        params = block.init(jax.random.PRNGKey(1), x, stats=stats)
        ref, ref_stats = block.apply(params, x, stats=stats, want_stats=True)
    finally:
        video_unet.PERF_PALLAS_ATTN = old

    video_unet.PERF_PALLAS_ATTN = True
    try:
        out, out_stats = block.apply(params, x, stats=stats, want_stats=True)
    finally:
        video_unet.PERF_PALLAS_ATTN = old

    # plain array in -> plain array out (the entry unpads on exit)
    assert not hasattr(out, "hw")
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_stats), np.asarray(ref_stats), atol=5e-3, rtol=5e-4
    )


def test_attn_hmajor_matches_legacy_layout():
    """V2A_ATTN_HMAJOR reorders only the layout of the XLA attention
    einsums (one qkv head transpose instead of per-operand relayouts);
    outputs must match the legacy form exactly on the same params."""
    from v2a_tpu.models import video_unet
    from v2a_tpu.models.video_unet import SpatialAttentionBlock

    b, f, h, w, c, ch = 2, 2, 8, 8, 64, 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))

    block = SpatialAttentionBlock(num_head_channels=ch)
    assert not video_unet.PERF_PALLAS_ATTN  # plain-XLA default
    params = block.init(jax.random.PRNGKey(1), x)
    ref = block.apply(params, x)

    old = video_unet.PERF_ATTN_HMAJOR
    video_unet.PERF_ATTN_HMAJOR = True
    try:
        out = block.apply(params, x)
    finally:
        video_unet.PERF_ATTN_HMAJOR = old
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("shape", [(2, 8, 16, 128, 128), (1, 4, 32, 256, 128)])
def test_winograd_conv3x3_matches_xla(shape):
    """Winograd F(2x2,3x3) == the direct SAME conv (f32 interpret mode)."""
    from v2a_tpu.ops.resblock_kernels import winograd_conv3x3

    n, h, w, c, d = shape
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, c, d)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias

    got = winograd_conv3x3(x, kern, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-4, rtol=5e-4
    )
