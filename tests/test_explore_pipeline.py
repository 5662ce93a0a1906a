"""Pipelined exploration (cfg.pipeline_explore) — VERDICT round-3 item 3.

Two guarantees:
1. `VideoSampleStream` (the chunk-dispatched denoise chain) computes the
   exact `sample_u8` sequence — same keys, same step bodies, same clamp and
   quantization.
2. The pipelined exploration cycle commits the SAME episodes as the serial
   path: prefetching only moves WHEN frames are rendered and videos are
   sampled; the pinned env seeds and the per-cycle key order are unchanged
   for back-to-back cycles.
"""

import jax
import numpy as np
import pytest

from tests.test_trainer import FakeVideoModel, small_trainer
from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel


@pytest.fixture(scope="module")
def small_video_model():
    cfg = VideoModelConfig(
        image_size=(16, 16), sample_per_seq=3, timesteps=8,
        sampling_timesteps=8, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(2,), num_head_channels=16,
        text_dim=32, fused=False,
    )
    model = VideoPredModel(cfg)
    model.init(jax.random.PRNGKey(0))
    return model


def test_sample_stream_matches_sample_u8(small_video_model):
    model = small_video_model
    rs = np.random.RandomState(0)
    imgs01 = rs.rand(2, 16, 16, 3).astype(np.float32)
    tasks = ["task a", "task b"]
    rng = jax.random.PRNGKey(7)

    ref = np.asarray(model.sample_u8(rng, imgs01, tasks))
    stream = model.sample_u8_stream(rng, imgs01, tasks, n_chunks=3)
    # pump incrementally like the rollout loop would
    while stream.pump(1):
        pass
    out = np.asarray(stream.result_u8())
    assert out.shape == ref.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, ref)


def test_sample_stream_ddim_matches(small_video_model):
    """Chunked dispatch must match under the DDIM sampler family too."""
    import dataclasses

    model = small_video_model
    ddim = VideoPredModel(
        dataclasses.replace(model.config, sampling_timesteps=4)
    )
    ddim.params = model.params
    rs = np.random.RandomState(1)
    imgs01 = rs.rand(1, 16, 16, 3).astype(np.float32)
    rng = jax.random.PRNGKey(9)
    ref = np.asarray(ddim.sample_u8(rng, imgs01, ["task"]))
    stream = ddim.sample_u8_stream(rng, imgs01, ["task"], n_chunks=2)
    np.testing.assert_array_equal(np.asarray(stream.result_u8()), ref)


def test_stream_pump_counts(small_video_model):
    model = small_video_model
    imgs01 = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    stream = model.sample_u8_stream(
        jax.random.PRNGKey(0), imgs01, ["t"], n_chunks=4
    )
    assert stream.chunks_left == 4
    assert stream.pump(2) is True
    assert stream.chunks_left == 2
    stream.result_u8()
    assert stream.chunks_left == 0


def _episode_record(trainer):
    """All committed video-buffer episodes as comparable arrays
    (backend-agnostic: export_episodes covers the native C++ store too)."""
    return [
        (np.asarray(ep["imgs"]).copy(), np.asarray(ep["acts"]).copy())
        for ep in trainer.envBuf_vid.export_episodes()
    ]


def test_pipeline_explore_episode_equivalence(tmp_path):
    """Three back-to-back cycles, pipelined vs serial: identical episodes.

    Back-to-back cycles have no interleaved rng consumers, so the
    prefetch's earlier draws land on exactly the keys/seeds the serial path
    would draw at the next cycle's start."""
    records = []
    for pipeline in (False, True):
        trainer = small_trainer(
            tmp_path / f"p{pipeline}", with_h5=False,
            pipeline_explore=pipeline,
        )
        for _ in range(3):
            trainer.video_guided_explore()
        records.append(_episode_record(trainer))
        trainer.envs.check_no_envs_exist()

    serial, pipelined = records
    assert len(serial) == len(pipelined) and len(serial) > 0
    for (ia, aa), (ib, ab) in zip(serial, pipelined):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(aa, ab)


def test_pipeline_explore_parallel_pool(tmp_path):
    """Pool-parallel pipelined cycles run end-to-end: episodes commit,
    assignments rotate, envs close between cycles."""
    import dataclasses

    from v2a_tpu.envs.subproc import EnvWorkerPool
    from v2a_tpu.train.trainer import OnlineTrainer

    base = small_trainer(tmp_path, with_h5=False)
    with EnvWorkerPool("fake-2tk-v0", n_workers=2) as pool:
        trainer = OnlineTrainer(
            base.policy, base.envs,
            dataclasses.replace(base.cfg, pipeline_explore=True),
            str(tmp_path / "wd_pool"),
            video_model=FakeVideoModel(), seed=0, env_pool=pool,
        )
        trainer.video_guided_explore()
        trainer.video_guided_explore()
        assert trainer.cnt_vid_rollouts == 4
        assert len(trainer.envBuf_vid) == 4
    trainer.envs.check_no_envs_exist()


def test_pipeline_with_overlap_explore(tmp_path):
    """pipeline_explore composes with overlap_explore (worker thread):
    the full train loop runs, cycles commit, nothing leaks."""
    trainer = small_trainer(
        tmp_path, with_h5=False,
        pipeline_explore=True, overlap_explore=True,
        rand_explo_type="live",
    )
    trainer.train()
    assert trainer.step == 10
    assert trainer.cnt_vid_rollouts >= len(trainer.envs.task_list)
    assert trainer._explore_thread is None
    trainer.envs.check_no_envs_exist()
