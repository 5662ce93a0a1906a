"""Subprocess env workers + batched lock-step exploration."""

import numpy as np
import pytest

from v2a_tpu.envs.subproc import EnvWorkerPool
from v2a_tpu.train.explore import ExploreConfig
from v2a_tpu.train.explore_batched import BatchedGuidedRolloutExecutor


@pytest.fixture(scope="module")
def pool():
    with EnvWorkerPool("fake-2tk-small-v0", n_workers=2) as p:
        yield p


def test_worker_roundtrip(pool):
    tasks = pool.task_list
    assert len(tasks) == 2
    env_idx_results = pool.map([
        (i, "init_1_given_env", (tasks[i], 10000), {"e_seed": 5})
        for i in range(2)
    ])
    imgs = pool.map([
        (i, "render_an_env", (tasks[i], "agent", 10000), {})
        for i in range(2)
    ])
    assert imgs[0].shape == (32, 32, 3) and imgs[0].dtype == np.uint8
    out = pool.map([
        (i, "step_k",
         (tasks[i], 10000, np.zeros((4, 7), np.float32), "agent"),
         {"grasp_cam": "gripper"})
        for i in range(2)
    ])
    assert out[0]["imgs"].shape == (4, 32, 32, 3)
    assert out[0]["depth"].ndim == 2
    assert out[0]["ee_pos"].shape == (3,)
    pool.map([
        (i, "close_1_given_env", (tasks[i], 10000), {}) for i in range(2)
    ])


def test_worker_error_propagates(pool):
    with pytest.raises(RuntimeError, match="env worker failed"):
        pool.workers[0].call("step_an_env", "no-such-task", 0, np.zeros(7))


def test_batched_executor_matches_serial_structure(pool):
    """Lock-step batched rollouts produce structurally valid episodes with
    the same action-chunk layout as the serial executor."""
    tasks = pool.task_list
    cfg = ExploreConfig(
        n_acts_per_pred=4, n_preds_betw_vframes=(2, 2), act_down_val=-0.1,
        n_acts_down_range=(4, 4), n_acts_close_grp=2,
    )

    calls = {"n": 0, "batches": []}

    def batch_policy(obs01, goal01):
        calls["n"] += 1
        calls["batches"].append(obs01.shape[0])
        return np.zeros((obs01.shape[0], 4, 7), np.float32)

    execu = BatchedGuidedRolloutExecutor(
        pool, batch_policy, cfg,
        task_to_task_idx={t: 65 + i for i, t in enumerate(tasks)},
    )
    assignments = [(tasks[0], 10000), (tasks[1], 10000)]
    pool.map([
        (i, "init_1_given_env", (t, e), {"is_rand": True})
        for i, (t, e) in enumerate(assignments)
    ])
    start_imgs = pool.map([
        (i, "render_an_env", (t, "agent", e), {})
        for i, (t, e) in enumerate(assignments)
    ])
    video = np.stack([start_imgs[0]] * 3)  # 3 goal frames
    results = execu.execute_all(
        assignments, "agent", start_imgs, [video, video], seeds=[1, 2],
    )
    pool.map([
        (i, "close_1_given_env", (t, e), {})
        for i, (t, e) in enumerate(assignments)
    ])

    # 3 frames x 2 preds = 6 rounds, each ONE batched call of size 2
    assert calls["n"] == 6
    assert all(b == 2 for b in calls["batches"])
    for r in results:
        assert len(r.imgs) == len(r.acts) + 1
        assert r.imgs.dtype == np.uint8
        # at least the scheduled 6 * 4 actions, plus any grasp injections
        assert len(r.acts) >= 24


@pytest.mark.slow
def test_trainer_parallel_exploration(tmp_path):
    """Full trainer cycle with the worker pool wired in."""
    import jax

    from v2a_tpu.envs.fake import FakeEnvList
    from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
    from v2a_tpu.train.trainer import OnlineTrainer, TrainerConfig

    class StubVideo:
        def sample(self, rng, imgs01, tasks):
            return np.clip(
                np.stack([imgs01 * (1 + 0.05 * (i + 1)) for i in range(2)], 1),
                0, 1,
            )

    envs = FakeEnvList(num_tasks=2, img_hw=(32, 32))
    policy = DiffusionPolicy.create(PolicyConfig(
        image_size=(32, 32), down_dims=(32, 64), horizon=8, n_action_steps=4,
        num_train_timesteps=10, num_inference_steps=10,
        num_inference_steps_ddim=2,
    ))
    cfg = TrainerConfig(
        init_rand_steps=2, video_explo_freq=4, rand_explo_freq=1000,
        n_train_steps=8, save_freq=100, log_freq=4,
        buf_sample_batch_size=8, min_len_uB=9, model_act_horizon=8,
        max_episodes_rand=20, max_episodes_vid=20, randsam_path="",
        rand_explo_type="live", live_rand_ep_len=12,
    )
    with EnvWorkerPool(
        "fake-2tk-small-v0", n_workers=2
    ) as pool:
        trainer = OnlineTrainer(
            policy, envs, cfg, str(tmp_path / "wd"),
            video_model=StubVideo(),
            explore_config=__import__(
                "v2a_tpu.train.explore", fromlist=["ExploreConfig"]
            ).ExploreConfig(
                n_acts_per_pred=4, n_preds_betw_vframes=(1, 2),
                act_down_val=-0.1,
            ),
            seed=0, env_pool=pool,
        )
        trainer.train(8)
        assert trainer.step == 8
        assert len(trainer.envBuf_vid) >= 2
        assert trainer.cnt_vid_rollouts >= 2


def test_pool_task_rotation_covers_all_tasks(tmp_path):
    """With fewer workers than tasks, successive exploration cycles rotate
    through the whole task list."""
    import jax
    from v2a_tpu.envs.fake import FakeEnvList
    from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
    from v2a_tpu.train.trainer import OnlineTrainer, TrainerConfig

    class StubVideo:
        def sample(self, rng, imgs01, tasks):
            return np.clip(
                np.stack([imgs01 * (1 + 0.1 * (i + 1)) for i in range(2)], 1),
                0, 1,
            )

    envs = FakeEnvList(num_tasks=4, img_hw=(32, 32))
    policy = DiffusionPolicy.create(PolicyConfig(
        image_size=(32, 32), down_dims=(32, 64), horizon=8, n_action_steps=4,
        num_train_timesteps=10, num_inference_steps=10,
        num_inference_steps_ddim=2,
    ))
    cfg = TrainerConfig(
        randsam_path="", min_len_uB=9, model_act_horizon=8,
        max_episodes_vid=40,
    )
    with EnvWorkerPool(
        "fake-8tk-v0", n_workers=2, num_tasks=4, img_hw=(32, 32)
    ) as pool:
        trainer = OnlineTrainer(
            policy, envs, cfg, str(tmp_path / "wd"), video_model=StubVideo(),
            explore_config=ExploreConfig(
                n_acts_per_pred=4, n_preds_betw_vframes=(1, 1),
                act_down_val=-0.1,
            ),
            seed=0, env_pool=pool,
        )
        for _ in range(2):
            trainer.video_guided_explore()
    # 2 cycles x 2 workers rotate over all 4 tasks
    assert all(v == 1 for v in trainer.cnt_vid_rout_per_tk.values()), (
        trainer.cnt_vid_rout_per_tk
    )


def test_pool_auto_respawns_dead_worker_and_replays_scene():
    """Kill a worker mid-episode: the pool must respawn it, replay the
    journaled (seed-pinned init + steps) to rebuild the deterministic env
    state, and retry the in-flight chunk — matching a never-crashed serial
    run exactly."""
    from v2a_tpu.envs.fake import FakeEnvList
    from v2a_tpu.envs.subproc import EnvWorkerPool

    acts1 = np.tile(np.array([0.3, 0.1, 0, 0, 0, 0, -1], np.float32), (3, 1))
    acts2 = np.tile(np.array([-0.2, 0.4, 0, 0, 0, 0, -1], np.float32), (3, 1))

    with EnvWorkerPool("fake-2tk-small-v0", n_workers=1) as pool:
        task = pool.task_list[0]
        pool.map([(0, "init_1_given_env", (task, 10000), {"is_rand": True})])
        seed = pool.workers[0]._journal[0][2]["e_seed"]
        r1 = pool.map([(0, "step_k", (task, 10000, acts1, "agent"), {})])[0]

        pool.workers[0]._proc.kill()
        r2 = pool.map([(0, "step_k", (task, 10000, acts2, "agent"), {})])[0]

    # serial ground truth: same seed, same actions, no crash
    envs = FakeEnvList(num_tasks=2, img_hw=(32, 32))
    envs.init_1_given_env(task, 10000, e_seed=seed)
    for a in acts1:
        envs.step_an_env(task, 10000, a)
    want1_last = envs.render_an_env(task, "agent", 10000)
    imgs2 = []
    for a in acts2:
        envs.step_an_env(task, 10000, a)
        imgs2.append(envs.render_an_env(task, "agent", 10000))
    np.testing.assert_array_equal(r1["imgs"][-1], want1_last)
    np.testing.assert_array_equal(r2["imgs"], np.stack(imgs2))


def test_pool_application_errors_do_not_respawn():
    """ok=False replies (exceptions inside a live worker) surface as errors
    without burning a respawn."""
    import pytest as _pytest

    from v2a_tpu.envs.subproc import EnvWorkerPool

    with EnvWorkerPool("fake-2tk-small-v0", n_workers=1) as pool:
        with _pytest.raises(RuntimeError, match="env worker failed"):
            pool.map([(0, "no_such_method", (), {})])
        # worker is still the same live process afterwards
        assert pool.workers[0].alive
        assert pool.map([(0, "task_list", (), {})])[0] == pool.task_list


def test_pool_parallel_rollout_beats_serial(tmp_path):
    """CI guard for the pool-parallel exploration win (PERF.md measured
    3.4x on-chip): with sim cost ~0 (fake env) the batched lock-step policy
    calls must not be slower than the serial batch-1 loop. Both paths are
    warmed (compiles excluded) before the timed cycle."""
    import time

    import jax
    from v2a_tpu.envs.fake import FakeEnvList
    from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
    from v2a_tpu.train.explore import ExploreConfig
    from v2a_tpu.train.trainer import OnlineTrainer, TrainerConfig

    class StubVideo:
        def sample(self, rng, imgs01, tasks):
            return np.clip(
                np.stack([imgs01 * (1 + 0.1 * (i + 1)) for i in range(3)], 1),
                0, 1,
            )

    def make_trainer(workdir, pool=None):
        envs = FakeEnvList(num_tasks=4, img_hw=(32, 32))
        policy = DiffusionPolicy.create(PolicyConfig(
            image_size=(32, 32), down_dims=(32, 64), horizon=8,
            n_action_steps=4, num_train_timesteps=10,
            num_inference_steps=10, num_inference_steps_ddim=2,
        ))
        cfg = TrainerConfig(
            randsam_path="", min_len_uB=9, model_act_horizon=8,
            max_episodes_vid=64,
        )
        return OnlineTrainer(
            policy, envs, cfg, workdir, video_model=StubVideo(),
            explore_config=ExploreConfig(
                n_acts_per_pred=4, n_preds_betw_vframes=(2, 3),
                act_down_val=-0.1,
            ),
            seed=0, env_pool=pool,
        )

    def timed_cycles(trainer, n=2):
        trainer.video_guided_explore()  # warm (compiles)
        t0 = time.perf_counter()
        for _ in range(n):
            trainer.video_guided_explore()
        return (time.perf_counter() - t0) / n

    serial_t = timed_cycles(make_trainer(str(tmp_path / "serial")))
    with EnvWorkerPool(
        "fake-8tk-v0", n_workers=4, num_tasks=4, img_hw=(32, 32)
    ) as pool:
        parallel_t = timed_cycles(make_trainer(str(tmp_path / "par"), pool))

    # generous CI margin: the parallel path must at least not regress; on
    # real hardware the measured win is 3.4x (PERF.md)
    assert parallel_t < serial_t * 1.1, (parallel_t, serial_t)
