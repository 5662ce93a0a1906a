"""Alternative cross-attention video backbone: shapes, conditioning, and
drop-in compatibility with the diffusion sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2a_tpu.models.video_unet_xattn import VideoUNetXAttn
from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
from v2a_tpu.ops.schedules import DiffusionSchedule


@pytest.fixture(scope="module")
def net_and_params():
    net = VideoUNetXAttn(
        in_channels=6, out_channels=3, block_out_channels=(32, 64),
        layers_per_block=1, attn_heads=2, context_dim=64,
    )
    x = jnp.zeros((1, 2, 16, 16, 6))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 5, 64))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)
    return net, params


def test_shapes(net_and_params):
    net, params = net_and_params
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 3, 16, 16, 6), jnp.float32)
    out = net.apply(
        params, x, jnp.asarray([1, 5]), jnp.asarray(rs.randn(2, 5, 64),
                                                    jnp.float32)
    )
    assert out.shape == (2, 3, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_cross_attention_conditioning_matters(net_and_params):
    """Different text tokens must change the output — conditioning flows
    through cross-attention, unlike the additive primary backbone."""
    net, params = net_and_params
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 2, 16, 16, 6), jnp.float32)
    t = jnp.asarray([3])
    c1 = jnp.asarray(rs.randn(1, 5, 64), jnp.float32)
    c2 = jnp.asarray(rs.randn(1, 5, 64), jnp.float32)
    o1 = net.apply(params, x, t, c1)
    o2 = net.apply(params, x, t, c2)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


def test_temporal_attention_mixes_frames(net_and_params):
    """Perturbing frame 0 must change frame 1's output (temporal attention
    + temporal convs propagate across frames)."""
    net, params = net_and_params
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 2, 16, 16, 6), jnp.float32)
    t = jnp.asarray([3])
    ctx = jnp.asarray(rs.randn(1, 5, 64), jnp.float32)
    o1 = net.apply(params, x, t, ctx)
    o2 = net.apply(params, x.at[0, 0].add(1.0), t, ctx)
    assert np.abs(np.asarray(o1[0, 1]) - np.asarray(o2[0, 1])).max() > 1e-6


def test_drop_in_with_sampler(net_and_params):
    """Works as the model_fn of GaussianDiffusion — the two video backbone
    families are interchangeable."""
    net, params = net_and_params
    diffusion = GaussianDiffusion(
        schedule=DiffusionSchedule.create(6, "cosine"),
        objective="pred_v", sampling_timesteps=3,
    )
    out = diffusion.sample(
        lambda x, t, e: net.apply(params, x, t, e),
        jax.random.PRNGKey(0), (1, 2, 16, 16, 3),
        jnp.zeros((1, 1, 16, 16, 3)), jnp.zeros((1, 5, 64)),
    )
    assert out.shape == (1, 2, 16, 16, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_backbone_selectable_in_video_model():
    """VideoModelConfig(backbone='xattn') builds and samples end-to-end."""
    from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel

    cfg = VideoModelConfig(
        image_size=(16, 16), sample_per_seq=3, timesteps=6,
        sampling_timesteps=3, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, text_dim=64, backbone="xattn",
    )
    model = VideoPredModel(cfg)
    model.init(jax.random.PRNGKey(0))
    out = model.sample(
        jax.random.PRNGKey(1),
        np.zeros((2, 16, 16, 3), np.float32),
        ["task a", "task b"],
    )
    assert out.shape == (2, 2, 16, 16, 3)
    with pytest.raises(ValueError, match="unknown backbone"):
        VideoPredModel(VideoModelConfig(backbone="nope"))
