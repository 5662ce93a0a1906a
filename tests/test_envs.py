"""Tests for the environment layer: lifecycle invariants, determinism,
rendering, and the registry."""

import numpy as np
import pytest

from v2a_tpu.envs import FakeEnvList, make_env_list
from v2a_tpu.envs.base import make_seed_sets


def test_seed_sets_layout():
    seeds = make_seed_sets(["a", "b", "c"], 10000, 2)
    assert seeds == {"a": [10000, 10001], "b": [10002, 10003], "c": [10004, 10005]}


def test_one_env_at_a_time_invariant():
    envs = FakeEnvList(num_tasks=2, img_hw=(16, 16))
    t0, t1 = envs.task_list
    idx0 = envs.seed_sets[t0][0]
    envs.init_1_given_env(t0, idx0, e_seed=1)
    with pytest.raises(RuntimeError, match="one-env-at-a-time"):
        envs.init_1_given_env(t1, envs.seed_sets[t1][0], e_seed=2)
    envs.close_1_given_env(t0, idx0)
    envs.check_no_envs_exist()
    # close_exist_env is a no-op when nothing is alive
    envs.close_exist_env()


def test_seeded_reset_determinism():
    envs = FakeEnvList(num_tasks=1, img_hw=(32, 32))
    task = envs.task_list[0]
    idx = envs.seed_sets[task][0]

    frames = []
    for _ in range(2):
        envs.init_1_given_env(task, idx, e_seed=123)
        frames.append(envs.render_an_env(task, "agent", idx))
        envs.close_1_given_env(task, idx)
    np.testing.assert_array_equal(frames[0], frames[1])

    envs.init_1_given_env(task, idx, e_seed=124)
    other = envs.render_an_env(task, "agent", idx)
    envs.close_1_given_env(task, idx)
    assert (other != frames[0]).any()


def test_step_render_and_obs():
    envs = FakeEnvList(num_tasks=1, img_hw=(64, 64))
    task = envs.task_list[0]
    idx = envs.seed_sets[task][0]
    envs.init_1_given_env(task, idx, e_seed=7)
    obs0 = envs.get_an_env_obs(task, idx)
    assert obs0["robot0_eef_pos"].shape == (3,)

    act = np.zeros(7, np.float32)
    act[0] = 1.0
    obs, rew, done, info = envs.step_an_env(task, idx, act)
    assert obs["robot0_eef_pos"][0] > obs0["robot0_eef_pos"][0]
    assert not done

    img = envs.render_an_env(task, "agent", idx)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    rgb, dep = envs.render_an_env_with_depth(task, "gripper", idx)
    assert dep.shape[:2] == (64, 64) and (dep >= 0).all()
    envs.close_1_given_env(task, idx)


def test_consecutive_frames_differ():
    """The replay-buffer continuity check needs renders that change with
    state; static frames would make hindsight goals degenerate."""
    envs = FakeEnvList(num_tasks=1, img_hw=(32, 32))
    task = envs.task_list[0]
    idx = envs.seed_sets[task][0]
    envs.init_1_given_env(task, idx, e_seed=5)
    f0 = envs.render_an_env(task, "agent", idx)
    envs.step_an_env(task, idx, np.zeros(7, np.float32))
    f1 = envs.render_an_env(task, "agent", idx)
    assert (f0 != f1).any()
    envs.close_1_given_env(task, idx)


def test_success_on_grasp_at_object():
    envs = FakeEnvList(num_tasks=1, img_hw=(32, 32), step_scale=0.05)
    task = envs.task_list[0]
    idx = envs.seed_sets[task][0]
    sim = envs.init_1_given_env(task, idx, e_seed=11)
    # teleport-by-policy: walk greedily toward the object then close gripper
    for _ in range(200):
        obs = envs.get_an_env_obs(task, idx)
        delta = obs["obj_pos"] - obs["robot0_eef_pos"]
        act = np.zeros(7, np.float32)
        act[:3] = np.clip(delta / 0.05, -1, 1)
        if np.linalg.norm(delta) < 0.05:
            act[6] = 0.98
        _, _, done, _ = envs.step_an_env(task, idx, act)
        if done:
            break
    assert done
    envs.close_1_given_env(task, idx)


def test_registry():
    envs = make_env_list("fake-2tk-small-v0")
    assert len(envs.task_list) == 2
    assert envs.img_hw == (32, 32)
    with pytest.raises(KeyError):
        make_env_list("no-such-env")
    # override kwargs
    envs2 = make_env_list("fake-2tk-small-v0", num_tasks=3)
    assert len(envs2.task_list) == 3
