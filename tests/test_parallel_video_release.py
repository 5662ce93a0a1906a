"""Release-size video U-Net through the dp x tp numerics gate (VERDICT
round-4 weak #2 / ask #3).

The round-4 multichip gates proved numerics on toy video shapes only
(32ch/16^2/F=2); a TP partition-rule bug specific to the RELEASE-size layers
(128 base channels, mult 1-2-3-4-5 -> 640ch at the bottom, attention at
ds 8/16 with 16/20 heads, F=7 frames) would have passed every gate in the
repo. This test runs the production configuration of
`diffuser/libero/lb_video_model_utils.py:41-52` — spatial dims shrunk to
32x32 per the VERDICT's allowance (CPU time), every channel / head /
TP-sharded dim at release size — through `shard_for_mesh` on a dp=2 x tp=4
virtual mesh and asserts:

- a short DDIM sampling chain is allclose to the single-device chain,
- one video train step (the plain-XLA training path of
  `v2a_tpu/train/video_trainer.py`) matches single-device loss, grad norm,
  and post-step parameter checksum,
- wide release-size kernels REALLY shard over 'tp'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel
from v2a_tpu.parallel.mesh import make_mesh
from v2a_tpu.parallel.sharding import shard_train_state
from v2a_tpu.train.train_state import (
    EMAConfig, TrainState, make_train_step,
)


def _release_model() -> VideoPredModel:
    cfg = VideoModelConfig(
        image_size=(32, 32),  # spatial may shrink; channels must not
        sample_per_seq=8,     # F = 7 future frames (release)
        timesteps=100,
        sampling_timesteps=2,  # short chain, full release net per step
        model_channels=128,
        channel_mult=(1, 2, 3, 4, 5),
        num_res_blocks=2,
        attention_resolutions=(8, 16),
        num_head_channels=32,
        text_dim=512,
    )
    model = VideoPredModel(cfg)
    model.init(jax.random.PRNGKey(0))
    return model


def _checksum(tree) -> float:
    return float(
        sum(
            np.abs(np.asarray(leaf, np.float64)).sum()
            for leaf in jax.tree_util.tree_leaves(tree)
        )
    )


@pytest.mark.slow
def test_release_size_video_sampler_dp_tp_matches_single_device():
    model = _release_model()
    rs = np.random.RandomState(0)
    imgs01 = rs.rand(2, 32, 32, 3).astype(np.float32)
    tasks = ["fake task a pick", "fake task b place"]

    vid_ref = np.asarray(model.sample(jax.random.PRNGKey(7), imgs01, tasks))

    mesh = make_mesh(("dp", "tp"), (2, 4))
    model.shard_for_mesh(mesh)
    # the release-size wide kernels really shard over tp
    specs = {
        p.sharding.spec
        for p in jax.tree_util.tree_leaves(model.params)
        if hasattr(p, "sharding")
    }
    assert any("tp" in str(s) for s in specs), specs
    shard_widths = {
        p.shape[-1]
        for p in jax.tree_util.tree_leaves(model.params)
        if hasattr(p, "sharding") and "tp" in str(p.sharding.spec)
    }
    # 640 (bottom level) and 512-class dims must be among the sharded ones
    assert 640 in shard_widths, shard_widths

    vid = np.asarray(model.sample(jax.random.PRNGKey(7), imgs01, tasks))
    assert vid.shape == (2, 7, 32, 32, 3)
    pix_mae = float(np.abs(vid - vid_ref).mean())
    assert pix_mae < 5e-5, f"sharded release-size sampler diverged: {pix_mae}"


@pytest.mark.slow
def test_release_size_video_train_step_dp_tp_matches_single_device():
    model = _release_model()
    cfg = model.config
    diffusion = model.diffusion
    # the training path: plain-XLA module (video_trainer.py:152-158)
    unet = model.unet
    if getattr(unet, "fused", False):
        unet = unet.clone(fused=False)

    def vloss(params, rng, batch):
        return diffusion.p_losses(
            lambda x, tt, e: unet.apply(params, x, tt, e),
            rng, batch["video"], batch["x_cond_n"], batch["task_embed"],
        )

    import optax

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    train_step = jax.jit(
        make_train_step(vloss, tx, EMAConfig()), donate_argnums=(0,)
    )

    b, (h, w), f = 4, cfg.image_size, cfg.video_future_horizon
    rs = np.random.RandomState(1)
    host_batch = {
        "video": rs.rand(b, f, h, w, 3).astype(np.float32),
        "x_cond_n": (rs.rand(b, 1, h, w, 3) * 2 - 1).astype(np.float32),
        "task_embed": (rs.rand(b, 8, cfg.text_dim) * 0.1).astype(np.float32),
    }
    unet_params = model.params["unet"]

    def fresh_state():
        return TrainState.create(
            jax.tree_util.tree_map(jnp.array, unet_params), tx
        )

    dev0 = jax.devices()[0]
    batch_ref = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), dev0), host_batch
    )
    state_ref, loss_ref, gnorm_ref = train_step(
        fresh_state(), jax.random.PRNGKey(3), batch_ref
    )
    jax.block_until_ready(loss_ref)
    ref_ck = _checksum(state_ref.params)
    del state_ref  # ~1 GB of f32 params + moments; free before the sharded run

    mesh = make_mesh(("dp", "tp"), (2, 4))
    state = shard_train_state(fresh_state(), mesh)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp"))),
        host_batch,
    )
    with mesh:
        state, loss, gnorm = train_step(state, jax.random.PRNGKey(3), batch)
        jax.block_until_ready(loss)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=5e-5)
    np.testing.assert_allclose(float(gnorm), float(gnorm_ref), rtol=5e-5)
    np.testing.assert_allclose(_checksum(state.params), ref_ck, rtol=1e-6)
    specs = {
        p.sharding.spec
        for p in jax.tree_util.tree_leaves(state.params)
        if hasattr(p, "sharding")
    }
    assert any("tp" in str(s) for s in specs), specs
