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
