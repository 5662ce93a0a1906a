"""MW/Thor/Bridge video-model variants: each preset builds, initializes,
and samples end-to-end at a shrunken size (capability surface of
`flowdiffusion/flowdiffusion/unet.py:7-221`)."""

import dataclasses

import jax
import numpy as np
import pytest

from v2a_tpu.models.env_variants import (
    VIDEO_MODEL_VARIANTS,
    video_model_variant,
)


def test_variant_presets_match_reference_ctors():
    thor = VIDEO_MODEL_VARIANTS["thor"]
    assert thor.image_size == (64, 64)
    assert thor.channel_mult == (1, 2, 4)
    assert thor.num_res_blocks == 3
    assert thor.attention_resolutions == (4, 8)
    bridge = VIDEO_MODEL_VARIANTS["bridge"]
    assert bridge.image_size == (48, 64)
    assert bridge.model_channels == 160
    flow = VIDEO_MODEL_VARIANTS["mw_flow"]
    assert flow.channels == 2 and flow.cond_channels == 3
    with pytest.raises(KeyError):
        video_model_variant("nope")


@pytest.mark.parametrize("name", ["thor", "bridge", "mw_flow"])
def test_variant_samples_end_to_end_small(name):
    model = video_model_variant(
        name,
        image_size=(16, 16), sample_per_seq=3, model_channels=32,
        num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,),
        text_dim=64, timesteps=10, sampling_timesteps=2, fused=False,
    )
    model.init(jax.random.PRNGKey(0))
    cfg = model.config
    cond_ch = cfg.cond_channels or cfg.channels
    x_cond = np.random.RandomState(0).rand(2, 16, 16, cond_ch).astype(
        np.float32
    )
    out = model.sample(jax.random.PRNGKey(1), x_cond, ["a task", "b task"])
    assert out.shape == (2, 2, 16, 16, cfg.channels)
    assert np.isfinite(np.asarray(out)).all()
