"""Online-loop soak (VERDICT round-4 ask #7): the round-4 concurrency
features — pipelined exploration, host->HBM prefetch, overlapped explore
with donation-safe snapshots — have per-feature tests but had never run
TOGETHER for thousands of steps. This runs the full online loop with all of
them ON, buffer caps scaled to release ratios, periodic checkpoints, and a
mid-phase kill+resume, asserting:

- host RSS stays bounded after warm-up (no leak in the stream / prefetch /
  thread machinery),
- both replay buffers evict FIFO at cap (len pinned at cap, history counter
  keeps rising, sampling stays valid),
- a fresh trainer restores the checkpoint and continues to the target step
  with counters intact (`lb_online_trainer_v7.py:367-407` resume contract).
"""

import os

import jax
import numpy as np
import pytest

from v2a_tpu.envs.fake import FakeEnvList
from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel
from v2a_tpu.train.explore import ExploreConfig
from v2a_tpu.train.trainer import OnlineTrainer, TrainerConfig


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1024.0
    return 0.0


def _make(workdir, video, policy, seed=0):
    tcfg = TrainerConfig(
        num_init_rand_ep_per_tk=50,  # //25 -> 2 live rand eps per task
        init_rand_steps=20,
        video_explo_freq=40,
        rand_explo_freq=150, rand_explo_num_ep_per_tk=1,
        rand_explo_type="live", live_rand_ep_len=12,
        n_train_steps=100000,
        save_freq=500, log_freq=200,
        buf_sample_batch_size=8, min_len_uB=9, max_len_uB=120,
        model_act_horizon=8,
        # caps small enough that BOTH buffers evict during the soak
        # (release ratio rand:vid = 2:1, `lb_tk8_65to72.py`)
        max_episodes_rand=10, max_episodes_vid=5,
        randsam_path="",
        # round-4 concurrency features ALL ON
        pipeline_explore=True,
        overlap_explore=True,
        prefetch_depth=2,
        checkpoint_buffers=True,
    )
    ecfg = ExploreConfig(
        n_acts_per_pred=4, n_preds_betw_vframes=(1, 2), act_down_val=-0.1,
    )
    return OnlineTrainer(
        policy, FakeEnvList(num_tasks=2, img_hw=(32, 32)), tcfg,
        str(workdir), video_model=video, explore_config=ecfg, seed=seed,
    )


@pytest.mark.slow
def test_soak_all_concurrency_features_with_kill_resume(tmp_path):
    pcfg = PolicyConfig(
        image_size=(32, 32), down_dims=(32, 64), horizon=8,
        n_action_steps=4, num_train_timesteps=10, num_inference_steps=10,
        num_inference_steps_ddim=2, obs_feature_dim=32, num_kp=8,
        vision_stage_sizes=(1,), vision_stage_features=(32,),
    )
    policy = DiffusionPolicy.create(pcfg)
    # a real (tiny) video diffusion model so the chunked
    # `VideoSampleStream` pipeline path is exercised, not the eager branch
    vcfg = VideoModelConfig(
        image_size=(32, 32), sample_per_seq=4, timesteps=8,
        sampling_timesteps=2, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(8,), text_dim=64,
    )
    video = VideoPredModel(vcfg)
    video.init(jax.random.PRNGKey(0))

    wd = tmp_path / "soak"
    trainer = _make(wd, video, policy)

    # ---- phase 1: warm up + steady state ---------------------------------
    trainer.train(600)
    rss_warm = _rss_mb()
    trainer.train(1500)
    assert trainer.step == 1500
    rss_mid = _rss_mb()

    # both buffers hit cap and keep evicting FIFO
    assert len(trainer.envBuf_rand) == 10
    assert trainer.envBuf_rand.cnt_all_history_episodes > 10
    assert len(trainer.envBuf_vid) == 5
    assert trainer.envBuf_vid.cnt_all_history_episodes > 5
    # sampling the post-eviction buffers stays valid (continuity is
    # asserted inside add_episode; windows must be well-formed)
    hb = trainer.envBuf_vid.sample_batch(8, np.random.default_rng(0))
    assert hb["action"].shape == (8, 8, 7)
    steps_before = trainer.num_steps_in_env
    rollouts_before = trainer.cnt_vid_rollouts
    assert rollouts_before > 0

    # ---- kill: checkpoint, drop the trainer, resume in a fresh one -------
    trainer.save()
    del trainer

    trainer2 = _make(wd, video, policy, seed=7)
    trainer2.load()
    assert trainer2.step == 1500
    assert trainer2.num_steps_in_env == steps_before
    assert trainer2.cnt_vid_rollouts == rollouts_before
    # checkpoint_buffers restored the episode payloads
    assert len(trainer2.envBuf_rand) == 10
    assert len(trainer2.envBuf_vid) == 5

    # ---- phase 2: continue to the target ---------------------------------
    trainer2.train(2500)
    assert trainer2.step == 2500
    assert trainer2.cnt_vid_rollouts > rollouts_before
    assert trainer2.num_steps_in_env > steps_before

    # ---- RSS bound: steady-state growth, measured in ONE process ---------
    # (phase-2 runs in the same process; warm-up allocations — compiles,
    # donated-buffer pools — are excluded by anchoring after step 600)
    rss_end = _rss_mb()
    growth = rss_end - rss_warm
    assert growth < 1500, (
        f"RSS grew {growth:.0f} MB after warm-up "
        f"(warm {rss_warm:.0f} -> mid {rss_mid:.0f} -> end {rss_end:.0f})"
    )

    # metrics JSONL kept flowing through both phases
    mfile = wd / "metrics.jsonl"
    assert mfile.exists()
