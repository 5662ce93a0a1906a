"""Video-model trainer + timestep resamplers."""

import numpy as np
import pytest

from v2a_tpu.data.h5_ingest import write_randsam_file
from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel
from v2a_tpu.ops.resample import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from v2a_tpu.train.video_trainer import (
    VideoClipDataset,
    VideoModelTrainer,
    VideoTrainerConfig,
)


def test_loss_second_moment_resampler_prefers_lossy_timesteps():
    rs = np.random.default_rng(0)
    r = LossSecondMomentResampler(num_timesteps=10, history_per_term=3)
    # warm up: timestep 7 has 10x the loss of everything else
    for _ in range(3):
        ts = np.arange(10)
        losses = np.ones(10)
        losses[7] = 10.0
        r.update_with_losses(ts, losses)
    w = r.weights()
    assert w[7] == max(w)
    t, iw = r.sample(1000, rs)
    counts = np.bincount(t, minlength=10)
    assert counts[7] > counts.mean() * 2
    # importance weights keep the estimator unbiased: E[w] == 1
    assert abs(iw.mean() - 1.0) < 0.15


def test_uniform_sampler_and_factory():
    rs = np.random.default_rng(0)
    s = create_named_schedule_sampler("uniform", 10)
    assert isinstance(s, UniformSampler)
    t, w = s.sample(64, rs)
    assert t.min() >= 0 and t.max() < 10 and (w == 1).all()
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("nope", 10)


@pytest.fixture
def clip_h5(tmp_path):
    rs = np.random.RandomState(0)
    eps = {}
    for tk in ["task a", "task b"]:
        items = []
        for _ in range(2):
            T = 30
            imgs = rs.randint(0, 255, (T + 1, 16, 16, 3), np.uint8)
            acts = rs.uniform(-1, 1, (T, 7)).astype(np.float32)
            items.append((imgs, acts))
        eps[tk] = items
    path = str(tmp_path / "clips.hdf5")
    write_randsam_file(path, eps, read_only=False)
    return path


def test_video_clip_dataset_shapes(clip_h5):
    ds = VideoClipDataset(clip_h5, ["task a", "task b"], frames=3, stride=2)
    assert len(ds) == 4
    rs = np.random.default_rng(0)
    x_cond, video, tasks = ds.sample_batch(5, rs)
    assert x_cond.shape == (5, 16, 16, 3)
    assert video.shape == (5, 3, 16, 16, 3)
    assert x_cond.max() <= 1.0 and video.min() >= 0.0
    assert all(t in ("task a", "task b") for t in tasks)


@pytest.mark.slow
def test_video_trainer_dp_tp_mesh_matches_single_device(clip_h5, tmp_path):
    """VideoModelTrainer(mesh=...) is a NUMERICS-preserving dp x tp shard:
    batches split over 'dp' (XLA all-reduces grads on ICI), wide param /
    moment dims shard over 'tp' (shard_train_state leaf rule), and three
    Adam steps land on the same parameters as the single-device trainer
    (same seed -> same batches, same keys; threefry is partitionable so
    dp-sharded noise draws match single-device bit-for-bit)."""
    import jax

    from v2a_tpu.parallel.mesh import make_mesh

    cfg = VideoModelConfig(
        image_size=(16, 16), sample_per_seq=4, timesteps=8,
        sampling_timesteps=4, model_channels=64, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(8,), text_dim=64,
    )
    params_after = []
    for mesh in (None, make_mesh(("dp", "tp"), (4, 2))):
        model = VideoPredModel(cfg)
        ds = VideoClipDataset(clip_h5, ["task a", "task b"], frames=3,
                              stride=2)
        tr = VideoModelTrainer(
            model, ds,
            VideoTrainerConfig(batch_size=4, n_train_steps=3,
                               save_freq=10**9, log_freq=10**9),
            workdir=str(tmp_path / f"mesh{mesh is not None}"), seed=0,
            mesh=mesh,
        )
        tr.train(3)
        if mesh is not None:
            specs = [
                leaf.sharding.spec
                for leaf in jax.tree_util.tree_leaves(tr.state.params)
            ]
            assert any("tp" in str(s) for s in specs), specs
        params_after.append(jax.device_get(tr.state.params))

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), *params_after
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 2e-4


@pytest.mark.slow
def test_video_trainer_reduces_loss(clip_h5, tmp_path):
    cfg = VideoModelConfig(
        image_size=(16, 16), sample_per_seq=4, timesteps=8,
        sampling_timesteps=4, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(8,), text_dim=64,
    )
    model = VideoPredModel(cfg)
    ds = VideoClipDataset(clip_h5, ["task a", "task b"], frames=3, stride=2)
    trainer = VideoModelTrainer(
        model, ds,
        VideoTrainerConfig(
            batch_size=4, n_train_steps=20, save_freq=100, log_freq=5,
            schedule_sampler="loss-second-moment",
        ),
        workdir=str(tmp_path / "vid"),
    )
    trainer.train(20)
    assert trainer.step == 20
    # trained EMA published back into the model and sampling still works
    import jax

    out = model.sample(
        jax.random.PRNGKey(0),
        np.zeros((1, 16, 16, 3), np.float32),
        ["task a"],
    )
    assert out.shape == (1, 3, 16, 16, 3)
