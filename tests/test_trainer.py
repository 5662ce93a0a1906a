"""Integration tests for the online trainer on the fake env backend —
the reference's "luotest" fast-config strategy (SURVEY §4.2) turned into a
real hermetic test: tiny shapes, tiny budgets, full loop."""

import os

import jax
import numpy as np
import pytest

from v2a_tpu.data.h5_ingest import write_randsam_file
from v2a_tpu.envs.fake import FakeEnvList
from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
from v2a_tpu.train.trainer import (
    ExploreThrottle,
    IterTypeScheduler,
    OnlineTrainer,
    TrainerConfig,
)
from v2a_tpu.train.train_state import EMAConfig, ema_decay


class FakeVideoModel:
    """Deterministic stand-in for the frozen video diffusion model: returns
    F slightly-shifted copies of the first frame."""

    def __init__(self, horizon=3):
        self.horizon = horizon

    def sample(self, rng, imgs01, tasks):
        b = imgs01.shape[0]
        frames = []
        for f in range(self.horizon):
            frames.append(np.clip(imgs01 + 0.01 * (f + 1), 0, 1))
        return np.stack(frames, axis=1)


def small_trainer(tmp_path, with_video=True, with_h5=True, **cfg_kw):
    envs = FakeEnvList(num_tasks=2, img_hw=(32, 32))
    h5path = str(tmp_path / "randsam.hdf5")
    if with_h5:
        eps = {}
        rs = np.random.RandomState(0)
        for tk in envs.task_list:
            task_eps = []
            for k in range(4):
                T = 40
                imgs = rs.randint(0, 255, (T + 1, 32, 32, 3), dtype=np.uint8)
                acts = rs.uniform(-1, 1, (T, 7)).astype(np.float32)
                task_eps.append((imgs, acts))
            eps[tk] = task_eps
        write_randsam_file(h5path, eps, read_only=False)

    policy = DiffusionPolicy.create(
        PolicyConfig(
            image_size=(32, 32), down_dims=(32, 64), horizon=16,
            n_action_steps=8, num_train_timesteps=10,
            num_inference_steps=10, num_inference_steps_ddim=2,
        )
    )
    cfg_fields = dict(
        num_init_rand_ep_per_tk=2,
        max_episodes_rand=20, max_episodes_vid=10,
        min_len_uB=10, init_rand_steps=3,
        rand_cycle_steps=2, vid_cycle_steps=3,
        video_explo_freq=4, rand_explo_freq=6,
        rand_explo_num_ep_per_tk=1,
        buf_sample_batch_size=8,
        n_train_steps=10, save_freq=5, log_freq=2,
        randsam_path=h5path if with_h5 else "",
        h5_total_num_ep_per_task=4,
    )
    cfg_fields.update(cfg_kw)  # callers may override any default above
    cfg = TrainerConfig(**cfg_fields)
    video_model = FakeVideoModel() if with_video else None
    return OnlineTrainer(
        policy, envs, cfg, str(tmp_path / "workdir"),
        video_model=video_model, seed=0,
    )


def test_iter_type_scheduler_phases():
    cfg = TrainerConfig(init_rand_steps=5, rand_cycle_steps=2, vid_cycle_steps=3)
    sched = IterTypeScheduler(cfg)
    phases = []
    for step in range(20):
        sched.update(step)
        sched.count()
        phases.append(sched.iter_type)
    # pure rand during init phase
    assert phases[:5] == ["rand-bias"] * 5
    # afterwards alternates 2 rand / 3 vid
    assert "vid-bias" in phases[5:]
    # find the first vid-bias run and check cycle lengths
    post = phases[6:]
    runs = []
    cur, cnt = post[0], 0
    for p in post:
        if p == cur:
            cnt += 1
        else:
            runs.append((cur, cnt))
            cur, cnt = p, 1
    runs.append((cur, cnt))
    for phase, length in runs[1:-1]:  # interior runs have exact lengths
        assert length == (2 if phase == "rand-bias" else 3)


def test_explore_throttle_alternation():
    cfg = TrainerConfig(
        enable_noExp=True, noExp_start_buf_len_rand=1,
        noExp_start_buf_len_vid=10**9, Exp_noExp_rand=(3, 2),
    )
    th = ExploreThrottle(cfg)
    states = []
    for _ in range(12):
        th.update(len_rand=5, len_vid=0)
        states.append(th.explo_type_rand)
    # 3 explo, then 2 no-explo, then repeat (counters update on entry)
    assert states == [
        "explo", "explo", "no-explo", "no-explo", "explo",
        "explo", "explo", "no-explo", "no-explo", "explo",
        "explo", "explo",
    ]


def test_ema_decay_schedule():
    cfg = EMAConfig(update_after_step=0, inv_gamma=1.0, power=0.75)
    import jax.numpy as jnp

    assert float(ema_decay(jnp.asarray(0), cfg)) == 0.0
    d10 = float(ema_decay(jnp.asarray(10), cfg))
    d100 = float(ema_decay(jnp.asarray(100), cfg))
    assert 0 < d10 < d100 < 0.9999
    np.testing.assert_allclose(d10, 1 - (1 + 9) ** -0.75, rtol=1e-6)


@pytest.mark.slow
def test_full_online_loop(tmp_path):
    """The end-to-end slice: H5 ingest -> train steps -> video exploration ->
    mixed-buffer sampling -> checkpoint."""
    trainer = small_trainer(tmp_path)
    trainer.train()
    assert trainer.step == 10
    # video exploration ran (steps 4 and 8 qualify, both > init_rand_steps=3)
    assert trainer.cnt_vid_rollouts >= 2
    assert len(trainer.envBuf_vid) >= 2
    assert trainer.num_steps_in_env > 0
    # checkpoints exist
    from v2a_tpu.train.checkpoint import available_labels

    assert len(available_labels(trainer.workdir)) >= 1
    # metrics written
    assert os.path.exists(os.path.join(trainer.workdir, "metrics.jsonl"))
    # env lifecycle invariant held
    trainer.envs.check_no_envs_exist()


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path):
    trainer = small_trainer(tmp_path, with_video=False)
    trainer.train(n_steps=4)
    trainer.save()
    step0 = trainer.step
    envsteps0 = trainer.num_steps_in_env
    params0 = jax.tree_util.tree_leaves(trainer.state.params)[0]

    trainer2 = small_trainer(tmp_path, with_video=False)
    trainer2.load()
    assert trainer2.step == step0
    assert trainer2.num_steps_in_env == envsteps0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer2.state.params)[0]),
        np.asarray(params0),
    )
    # training continues from the restored step
    trainer2.train(n_steps=step0 + 2)
    assert trainer2.step == step0 + 2


@pytest.mark.slow
def test_trainer_with_dp_mesh(tmp_path):
    """Real data parallelism: 8-device CPU mesh, batch sharded over 'dp',
    replicated params; loss must match the unsharded semantics (same
    computation, compiler-inserted all-reduce)."""
    from v2a_tpu.parallel.mesh import make_mesh

    envs = FakeEnvList(num_tasks=2, img_hw=(32, 32))
    policy = DiffusionPolicy.create(
        PolicyConfig(
            image_size=(32, 32), down_dims=(32, 64), horizon=16,
            n_action_steps=8, num_train_timesteps=10,
            num_inference_steps=10, num_inference_steps_ddim=2,
        )
    )
    cfg = TrainerConfig(
        num_init_rand_ep_per_tk=1, min_len_uB=10,
        init_rand_steps=100, buf_sample_batch_size=8,
        n_train_steps=3, save_freq=100, log_freq=1,
        randsam_path="", rand_explo_type="live", live_rand_ep_len=20,
        max_episodes_rand=8, max_episodes_vid=8,
    )
    mesh = make_mesh(("dp",))
    assert mesh.shape["dp"] == 8
    trainer = OnlineTrainer(
        policy, envs, cfg, str(tmp_path / "wd"), video_model=None,
        seed=0, mesh=mesh,
    )
    trainer.train(3)
    assert trainer.step == 3
    # state stayed replicated and finite
    p0 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert np.isfinite(np.asarray(p0)).all()

    # batch divisibility is enforced
    bad = TrainerConfig(buf_sample_batch_size=9, randsam_path="")
    with pytest.raises(ValueError, match="not divisible"):
        OnlineTrainer(policy, envs, bad, str(tmp_path / "wd2"), mesh=mesh)


def test_buffer_checkpoint_resume(tmp_path):
    """With checkpoint_buffers, a fresh trainer resumes with full buffers
    (the reference restarts buffer filling on resume)."""
    tr = small_trainer(tmp_path, with_video=False, checkpoint_buffers=True)
    tr.train(5)  # save_freq=5 -> checkpoint lands at step 5
    n_rand = len(tr.envBuf_rand)
    assert n_rand > 0
    assert (tmp_path / "workdir" / "buf_rand.npz").exists()

    tr2 = small_trainer(tmp_path, with_video=False, checkpoint_buffers=True)
    tr2.load()
    assert tr2.step == 5
    assert len(tr2.envBuf_rand) == n_rand
    # resumed buffers actually sample
    batch = tr2.envBuf_rand.sample_batch(4, np.random.default_rng(0))
    assert batch["img_obs"].shape[0] == 4


def test_ema_update_every_is_honored():
    """update_every=3: EMA only moves on multiples of 3 (ema_pytorch
    semantics the config mirrors)."""
    import optax
    from v2a_tpu.train.train_state import (
        EMAConfig, TrainState, make_train_step, make_optimizer, OptimizerConfig,
    )

    def loss_fn(params, rng, batch):
        return jnp.sum((params["w"] - batch) ** 2)

    import jax.numpy as jnp  # noqa: F811

    tx = make_optimizer(OptimizerConfig(lr=1e-1, weight_decay=0.0))
    params = {"w": jnp.ones((4,))}
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(
        loss_fn, tx, EMAConfig(update_every=3, beta=0.5, inv_gamma=1.0,
                               power=1.0),
    ))
    batch = jnp.zeros((4,))
    emas = []
    for i in range(6):
        state, loss, gn = step(state, jax.random.PRNGKey(i), batch)
        emas.append(np.asarray(state.ema_params["w"]).copy())
    # steps 1,2 leave EMA untouched; step 3 moves it
    np.testing.assert_array_equal(emas[0], np.ones(4))
    np.testing.assert_array_equal(emas[1], np.ones(4))
    assert (emas[2] != np.ones(4)).any()
    np.testing.assert_array_equal(emas[3], emas[2])
    np.testing.assert_array_equal(emas[4], emas[2])
    assert (emas[5] != emas[2]).any()


def test_serial_explore_rollout_scene_matches_video_condition(tmp_path):
    """Regression: the serial exploration path must roll out in the SAME
    scene the guidance video was conditioned on. FakeEnvList renders are
    seed-dependent (object placement from the seed), so re-creating the env
    with a fresh random seed between the conditioning render and the rollout
    (the round-1 bug) makes the rollout start frame diverge from the frame
    fed to the video model (`lb_online_trainer_v7.py:877-919` keeps one env
    alive throughout)."""
    trainer = small_trainer(tmp_path, with_video=True)

    captured = {}
    orig_sample = trainer.video_model.sample

    def spy_sample(rng, imgs01, tasks):
        captured["cond"] = np.asarray(imgs01).copy()
        return orig_sample(rng, imgs01, tasks)

    trainer.video_model.sample = spy_sample

    starts = []
    orig_execute = trainer.executor.execute

    def spy_execute(task, cam, env_idx, img_start, video):
        starts.append(np.asarray(img_start).copy())
        return orig_execute(task, cam, env_idx, img_start, video)

    trainer.executor.execute = spy_execute

    trainer.video_guided_explore()

    assert "cond" in captured and starts
    cond_u8 = np.round(captured["cond"] * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(np.stack(starts), cond_u8)


def test_prefetch_iterator_error_propagation():
    from v2a_tpu.parallel.prefetch import PrefetchIterator

    def boom():
        raise RuntimeError("sample failed")

    with PrefetchIterator(boom, depth=2) as it:
        with pytest.raises(RuntimeError, match="sample failed"):
            next(it)


def test_prefetch_flushed_around_buffer_mutations(tmp_path):
    """The prefetcher must be stopped before exploration/ingestion mutate
    the replay buffers (stale in-flight batches are dropped), then restarted
    for the train step."""
    trainer = small_trainer(tmp_path, with_video=True)
    assert trainer.cfg.prefetch_depth > 0  # default-on

    states = {"explore": [], "ingest": []}
    orig_explore = trainer.video_guided_explore
    orig_ingest = trainer.ingest_h5

    def spy_explore(*a, **k):
        states["explore"].append(trainer._prefetch is None)
        return orig_explore(*a, **k)

    def spy_ingest(*a, **k):
        states["ingest"].append(trainer._prefetch is None)
        return orig_ingest(*a, **k)

    trainer.video_guided_explore = spy_explore
    trainer.ingest_h5 = spy_ingest
    trainer.train(8)

    # the loop reached both exploration kinds, and the prefetcher was
    # flushed (None) every time a mutation ran
    assert states["explore"] and all(states["explore"])
    # ingest_h5 also runs once pre-loop for the initial fill
    assert len(states["ingest"]) >= 2 and all(states["ingest"])
    assert trainer._prefetch is None  # flushed on exit


def test_train_prefetch_off_matches_semantics(tmp_path):
    """prefetch_depth=0 keeps the synchronous path working."""
    trainer = small_trainer(tmp_path, with_video=False, prefetch_depth=0)
    trainer.train(4)
    assert trainer.step == 4


# -- overlapped exploration (cfg.overlap_explore) ---------------------------


def test_overlap_explore_full_loop(tmp_path):
    """overlap_explore=True runs exploration on a worker thread and commits
    the same NUMBER of episodes/rollouts as the synchronous loop (contents
    differ: the overlap mode uses private RNG streams by design)."""
    (tmp_path / "sync").mkdir()
    (tmp_path / "ovl").mkdir()
    sync = small_trainer(tmp_path / "sync")
    sync.train()
    overlap = small_trainer(tmp_path / "ovl", overlap_explore=True)
    overlap.train()

    assert overlap.step == sync.step == 10
    # both explore cadences fired identically (steps 4 and 8); the final
    # in-flight cycle was committed by the exit barrier
    assert overlap.cnt_vid_rollouts == sync.cnt_vid_rollouts
    assert len(overlap.envBuf_vid) == len(sync.envBuf_vid)
    assert overlap.num_steps_in_env > 0
    # per-task counters stay consistent with the total
    assert sum(overlap.cnt_vid_rout_per_tk.values()) == overlap.cnt_vid_rollouts
    # barrier state fully drained
    assert overlap._explore_thread is None
    assert overlap._explore_snapshot is None
    assert overlap._prefetch is None
    overlap.envs.check_no_envs_exist()


def test_overlap_snapshot_survives_donated_train_step(tmp_path):
    """The worker's EMA params are a deep copy: the donated train step
    invalidates the live state's buffers, so an aliased snapshot would make
    the worker read deleted arrays."""
    trainer = small_trainer(tmp_path, overlap_explore=True)
    trainer.train(2)  # fills envBuf_rand, no exploration yet (init=3)

    trainer._spawn_explore()
    snap_leaf = jax.tree_util.tree_leaves(
        trainer._explore_snapshot.ema_params
    )[0]
    live_leaf = jax.tree_util.tree_leaves(trainer.state.ema_params)[0]
    assert snap_leaf is not live_leaf  # independent buffers

    # donate the live state while the worker runs, then join + commit
    batch = trainer._sample_device_batch()
    trainer.rng, sub = jax.random.split(trainer.rng)
    trainer.state, _, _ = trainer._train_step(trainer.state, sub, batch)
    trainer._join_explore()
    assert trainer.cnt_vid_rollouts == len(trainer.envs.task_list)
    assert len(trainer.envBuf_vid) == len(trainer.envs.task_list)


def test_overlap_explore_worker_error_surfaces(tmp_path):
    """An exception in the worker thread is re-raised at the join barrier,
    not swallowed."""
    trainer = small_trainer(tmp_path, overlap_explore=True)
    trainer.train(2)

    def boom():
        raise RuntimeError("explore worker failed")

    trainer._explore_rollouts = boom
    trainer._spawn_explore()
    with pytest.raises(RuntimeError, match="explore worker failed"):
        trainer._join_explore()
    assert trainer._explore_thread is None


def test_overlap_with_live_rand_explore_coincidence(tmp_path):
    """When live rand exploration (which shares envs/executor with the
    worker) lands on the same step as a video cycle, the loop falls back to
    the synchronous path for that step instead of racing."""
    trainer = small_trainer(
        tmp_path, with_h5=False,
        overlap_explore=True, rand_explo_type="live",
        video_explo_freq=4, rand_explo_freq=4,
    )
    trainer.train()
    assert trainer.step == 10
    assert trainer.cnt_vid_rollouts >= 2
    assert trainer._explore_thread is None
    trainer.envs.check_no_envs_exist()


def test_overlap_with_live_rand_explore_staggered(tmp_path):
    """The ACTUAL overlap case the coincidence test misses: live rand at a
    later step (6) joining a video cycle spawned at step 4 that may still be
    in flight. The loop must join the worker BEFORE live rand touches the
    shared envs/executor (trainer loop: join+flush ahead of rand explore)."""
    trainer = small_trainer(
        tmp_path, with_h5=False,
        overlap_explore=True, rand_explo_type="live",
        video_explo_freq=4, rand_explo_freq=6,
    )

    orig_live = trainer.live_rand_explore
    orig_spawn = trainer._spawn_explore
    spawned = []

    def spawn_recording():
        orig_spawn()
        spawned.append(trainer.step)

    def live_asserting(n_ep):
        # the in-flight video cycle must be joined before live rand runs
        assert trainer._explore_thread is None, (
            "live rand explore ran while a video cycle was in flight"
        )
        trainer.envs.check_no_envs_exist()
        return orig_live(n_ep)

    trainer._spawn_explore = spawn_recording
    trainer.live_rand_explore = live_asserting
    trainer.train()

    assert trainer.step == 10
    assert spawned, "no overlapped video cycle was ever spawned"
    assert 4 in spawned  # step 4: video only -> overlapped
    assert trainer.cnt_vid_rollouts >= len(trainer.envs.task_list)
    assert len(trainer.envBuf_rand) > 0  # live rand episodes landed
    assert trainer._explore_thread is None
    trainer.envs.check_no_envs_exist()
