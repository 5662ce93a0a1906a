"""Parallel evaluator: lock-step protocol must reproduce the serial
evaluator exactly under deterministic policy/video functions."""

import numpy as np
import pytest

from v2a_tpu.envs.fake import FakeEnvList
from v2a_tpu.envs.subproc import EnvWorkerPool
from v2a_tpu.eval.harness import EvalConfig, Evaluator
from v2a_tpu.eval.parallel import ParallelEvaluator

CFG = EvalConfig(
    n_seeds=2, eval_n_preds_betw_vframes=2, num_vid_pred_per_ep=2,
    use_vid_first_n_frames=2, n_acts_per_pred=4, vis=False,
    is_stop_at_suc=True,
)
HORIZON = 3


def _policy_serial(img_obs01, img_goal01):
    # deterministic: move toward a fixed direction scaled by goal brightness
    mag = float(img_goal01.mean())
    a = np.zeros((4, 7), np.float32)
    a[:, 0] = 0.5 * mag
    a[:, 6] = 0.9
    return a


def _policy_batch(obs01, goal01):
    return np.stack(
        [_policy_serial(o[None], g[None]) for o, g in zip(obs01, goal01)]
    )


def _video_serial(img01, task):
    return np.clip(
        np.stack([img01 * (1 + 0.1 * (i + 1)) for i in range(HORIZON)]), 0, 1
    )


def _video_batch(imgs01, tasks):
    return np.stack([_video_serial(img, t) for img, t in zip(imgs01, tasks)])


def test_parallel_eval_matches_serial():
    envs = FakeEnvList(num_tasks=2, img_hw=(32, 32), grasp_radius=10.0)
    serial = Evaluator(
        envs, _policy_serial, _video_serial, video_horizon=HORIZON, config=CFG
    )
    ref = serial.run_evals()

    with EnvWorkerPool(
        "fake-2tk-small-v0", n_workers=3, grasp_radius=10.0
    ) as pool:
        par = ParallelEvaluator(
            pool, _policy_batch, _video_batch, video_horizon=HORIZON,
            config=CFG,
        )
        got = par.run_evals()

    assert got["num_evals"] == ref["num_evals"] == 4
    assert got["is_sucs_per_tk"] == ref["is_sucs_per_tk"]
    assert got["suc_rate"] == ref["suc_rate"]
    assert got["seeds"] == ref["seeds"]


def test_parallel_eval_episode_trajectories_match_serial():
    """Frame-for-frame identical rollouts for one (task, seed)."""
    envs = FakeEnvList(num_tasks=2, img_hw=(32, 32))
    serial = Evaluator(
        envs, _policy_serial, _video_serial, video_horizon=HORIZON, config=CFG
    )
    task = envs.task_list[0]
    env_idx = envs.seed_sets[task][0]
    envs.init_1_given_env(task, env_idx, e_seed=100)
    ref = serial.eval_1_env(task, "agent", env_idx)
    envs.close_1_given_env(task, env_idx)

    with EnvWorkerPool("fake-2tk-small-v0", n_workers=1) as pool:
        par = ParallelEvaluator(
            pool, _policy_batch, _video_batch, video_horizon=HORIZON,
            config=CFG,
        )
        got = par._run_wave([(task, env_idx, 100)], "agent")[0]

    assert got.is_suc == ref.is_suc
    assert got.imgs.shape == ref.imgs.shape
    np.testing.assert_array_equal(got.imgs, ref.imgs)
    assert len(got.pred_videos) == len(ref.pred_videos)
    for a, b in zip(got.pred_videos, ref.pred_videos):
        np.testing.assert_array_equal(a, b)
