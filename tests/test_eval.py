"""Eval harness: replanning cadence, result accounting, artifact layout."""

import os

import numpy as np
import pytest

from v2a_tpu.envs.fake import FakeEnvList
from v2a_tpu.eval.harness import EvalConfig, Evaluator, save_result_json


class CountingVideoFn:
    """Brightness-ramp videos; counts calls to verify the replanning
    cadence (`lb_eval_helper.py:233-268`)."""

    def __init__(self, horizon):
        self.horizon = horizon
        self.calls = 0

    def __call__(self, img01, task):
        self.calls += 1
        return np.clip(
            np.stack(
                [img01 * (1 + 0.05 * (i + 1)) for i in range(self.horizon)]
            ),
            0, 1,
        )


def _zero_policy(n_acts=4, act_dim=7):
    def fn(img_obs01, img_goal01):
        return np.zeros((n_acts, act_dim), np.float32)

    return fn


def _make(tmp_path, horizon=3, **cfg_kw):
    envs = FakeEnvList(num_tasks=2, img_hw=(32, 32))
    video_fn = CountingVideoFn(horizon)
    cfg = EvalConfig(
        n_seeds=1, eval_n_preds_betw_vframes=2, num_vid_pred_per_ep=2,
        use_vid_first_n_frames=2, n_acts_per_pred=4, vis=True, **cfg_kw
    )
    ev = Evaluator(
        envs, _zero_policy(), video_fn, video_horizon=horizon, config=cfg,
        save_path=str(tmp_path),
    )
    return ev, video_fn


def test_replanning_cadence_and_frame_budget(tmp_path):
    """num_total_frames = (num_vid_ppp-1)*use_first_n + v_hzn and one video
    re-prediction per consumed `use_vid_first_n_frames` frames."""
    ev, video_fn = _make(tmp_path)
    envs = ev.envs
    task = envs.task_list[0]
    env_idx = envs.seed_sets[task][0]
    envs.init_1_given_env(task, env_idx, e_seed=100)
    res = ev.eval_1_env(task, "agent", env_idx)
    envs.close_1_given_env(task, env_idx)

    assert video_fn.calls == 2  # num_vid_pred_per_ep
    # frames (2-1)*2+3 = 5, each: 2 preds x 4 acts -> 40 env steps
    assert len(res.imgs) == 5 * 2 * 4 + 1
    assert len(res.pred_videos) == 2
    assert res.pred_videos[0].shape == (4, 32, 32, 3)  # start + 3 frames


def test_run_evals_accounting_and_json(tmp_path):
    ev, _ = _make(tmp_path)
    results = ev.run_evals()
    assert results["num_evals"] == 2  # 2 tasks x 1 cam x 1 seed
    assert set(results["suc_rate_per_tk"]) == set(ev.envs.task_list)
    assert results["seeds"] == [100]
    assert all(len(v) == 1 for v in results["run_times_per_tk"].values())

    path = save_result_json(
        results, str(tmp_path), epoch=5000, dp_ds=8, vid_ds=4,
        num_vid_pred_per_ep=2, use_vid_first_n_frames=2, eval_seed=0,
    )
    assert os.path.basename(path).startswith("result-nm2-sr")
    assert "-ep5k-" in path
    # per-episode artifacts were written
    arts = [
        f for root, _, files in os.walk(tmp_path) for f in files
        if f.endswith((".mp4", ".gif", ".png"))
    ]
    assert len(arts) > 0


def test_stop_at_success_short_circuits(tmp_path):
    """A policy that drives straight to the object with the gripper closed
    must end the episode early when is_stop_at_suc."""
    envs = FakeEnvList(num_tasks=1, img_hw=(32, 32), grasp_radius=10.0)

    def greedy(img_obs01, img_goal01):
        a = np.zeros((4, 7), np.float32)
        a[:, 6] = 0.99  # close gripper; grasp_radius is huge -> success
        return a

    cfg = EvalConfig(
        n_seeds=1, eval_n_preds_betw_vframes=2, num_vid_pred_per_ep=2,
        use_vid_first_n_frames=2, n_acts_per_pred=4, vis=False,
        is_stop_at_suc=True,
    )
    video_fn = CountingVideoFn(3)
    ev = Evaluator(envs, greedy, video_fn, video_horizon=3, config=cfg)
    results = ev.run_evals()
    assert results["suc_rate"] == 1.0


def test_uint8_video_fn_accepted(tmp_path):
    """Video fns may return uint8 frames directly (device-side
    quantization cuts device-to-host readback 4x); the harness must use
    them as-is instead of re-scaling by 255."""

    class U8VideoFn(CountingVideoFn):
        def __call__(self, img01, task):
            v01 = super().__call__(img01, task)
            return (np.clip(v01, 0.0, 1.0) * 255).astype(np.uint8)

    envs = FakeEnvList(num_tasks=1, img_hw=(32, 32))
    cfg = EvalConfig(
        n_seeds=1, eval_n_preds_betw_vframes=2, num_vid_pred_per_ep=2,
        use_vid_first_n_frames=2, n_acts_per_pred=4, vis=False,
    )
    video_fn = U8VideoFn(3)
    ev = Evaluator(envs, _zero_policy(), video_fn, video_horizon=3,
                   config=cfg)
    task = envs.task_list[0]
    env_idx = envs.seed_sets[task][0]
    envs.init_1_given_env(task, env_idx, e_seed=7)
    res = ev.eval_1_env(task, "agent", env_idx)
    envs.close_1_given_env(task, env_idx)
    assert video_fn.calls == 2
    assert len(res.imgs) > 1
    assert all(pv.dtype == np.uint8 for pv in res.pred_videos)


def test_device_quantize_matches_host():
    """`_quantize_u8` (device-side) must reproduce the host
    `(x * 255).astype(np.uint8)` truncation bit-for-bit on in-range
    inputs, and clamp out-of-range values."""
    from v2a_tpu.models.video_model import _quantize_u8

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 8, 8, 3)).astype(np.float32)
    got = np.asarray(_quantize_u8(x))
    want = (x * 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    # out-of-range clamps instead of wrapping
    bad = np.array([-0.5, 1.5, 1.0, 0.0], np.float32)
    np.testing.assert_array_equal(
        np.asarray(_quantize_u8(bad)), [0, 255, 255, 0]
    )
