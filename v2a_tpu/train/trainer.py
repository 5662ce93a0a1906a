"""The online trainer: replay-driven policy training interleaved with
video-guided exploration.

TPU-native re-design of `LB_Online_Trainer_V7`
(`diffuser/libero/lb_online_trainer_v7.py:29-1347`). The torch original is a
1.3k-line god-object; here the runtime decomposes into:

- a jitted fused train step (`train/train_state.py`) fed by a host->HBM
  prefetch pipeline (`parallel/prefetch.py`) — the reference samples and
  transfers synchronously inside the loop (`:558,586`),
- host-side iteration/exploration schedulers with the exact reference
  semantics (rand-bias/vid-bias cycling `:942-970`, explore/no-explore
  throttling `:432-468`),
- a `GuidedRolloutExecutor` for the dynamic exploration control flow
  (`train/explore.py`),
- Orbax checkpoints with milestone bucketing (`train/checkpoint.py`).

Everything the device touches has static shapes; everything dynamic
(buffers, env lifecycles, schedules) stays in numpy/Python.
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.data.h5_ingest import add_episodes_to_buffer
from v2a_tpu.data.replay_buffer import ReplayBuffer, merge_batches
from v2a_tpu.envs.base import EnvList
from v2a_tpu.models.policy import DiffusionPolicy
from v2a_tpu.train import checkpoint as ckpt
from v2a_tpu.train.explore import ExploreConfig, GuidedRolloutExecutor
from v2a_tpu.train.metrics import MetricsLogger, Timer, per_task_metric_names
from v2a_tpu.train.train_state import (
    EMAConfig,
    OptimizerConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """The `trainer_dict` surface of the release config
    (`config/libero/lb_tk8_65to72.py:70-133`) plus loop-level knobs."""

    # buffers
    num_init_rand_ep_per_tk: int = 50
    max_episodes_rand: int = 1200
    max_episodes_vid: int = 600
    max_len_uB: int = 700
    min_len_uB: int = 30
    model_act_horizon: int = 16

    # iteration scheduler
    init_rand_steps: int = 10000
    rand_cycle_steps: int = 100
    vid_cycle_steps: int = 400

    # exploration cadence
    video_explo_freq: int = 200
    rand_explo_freq: int = 500
    rand_explo_num_ep_per_tk: int = 2

    # buffer sampling
    buf_sample_batch_size: int = 64
    buf_sample_method: str = "rand_prob"
    buf_sample_randBuf_prob: float = 0.3
    buf_sample_ratio_rand: Tuple[float, float] = (0.75, 0.25)
    buf_sample_ratio_vid: Tuple[float, float] = (0.25, 0.75)

    # explore/no-explore throttle
    enable_noExp: bool = True
    noExp_start_buf_len_rand: int = 500
    noExp_start_buf_len_vid: int = 500
    Exp_noExp_rand: Tuple[int, int] = (1000, 1000)
    Exp_noExp_vid: Tuple[int, int] = (1000, 1000)

    # training budget / cadence
    n_train_steps: int = 200_000
    gradient_accumulate_every: int = 1
    save_freq: int = 1000
    log_freq: int = 100
    n_saves: int = 5
    label_freq: Optional[int] = None  # default: n_train_steps // n_saves

    # data
    randsam_path: str = ""
    h5_total_num_ep_per_task: int = 500
    is_stop_at_suc: bool = False
    # 'from_h5' streams pre-generated episodes (`rand_explo_type`
    # `config/libero/lb_tk8_65to72.py:128`); 'live' runs the random-action
    # sampler in the simulator instead (no dataset file required)
    rand_explo_type: str = "from_h5"
    live_rand_ep_len: int = 120
    # debug image dumps every N steps (0 = off)
    debug_img_freq: int = 0
    # host->HBM prefetch depth: batch t+1 is sampled and transferred while
    # step t runs (replaces the reference's synchronous `.to(device)` at
    # `lb_online_trainer_v7.py:586`); 0 = synchronous. The prefetcher is
    # flushed around exploration / H5 ingestion since those mutate the
    # buffers being sampled.
    prefetch_depth: int = 2
    # also checkpoint the replay buffers (beyond the reference, whose resume
    # restarts buffer filling)
    checkpoint_buffers: bool = False
    # Pipeline the exploration cycle: render the NEXT cycle's start frames
    # at the top of the current cycle and dispatch its guidance-video chain
    # in chunks that interleave with this cycle's rollout-phase policy
    # programs — the chip works through the video chain during host
    # sim/readback gaps instead of idling, so steady-state cycle wall-clock
    # approaches max(video, rollouts) rather than their sum (VERDICT round-3
    # item 3; the reference is fully serial, `lb_online_trainer_v7.py:
    # 871-938`). Sound because the video model is FROZEN: videos depend
    # only on (start frame, task, key), and the start frame is pinned by
    # the recorded env seed the rollout reopens with. Episode equivalence
    # vs the serial path: tests/test_explore_pipeline.py.
    pipeline_explore: bool = False
    # denoise-chain chunks per prefetched video (trade-off: more chunks =
    # finer interleaving with policy programs, more dispatch overhead)
    pipeline_video_chunks: int = 20
    # run video-guided exploration on a worker thread while training
    # continues, committing episodes/counters at a main-thread join barrier
    # (SURVEY §7 "start synchronous for parity, then overlap"). Deviation
    # from the reference's strictly interleaved loop
    # (`lb_online_trainer_v7.py:504-507`): train steps issued while a cycle
    # is in flight sample the PRE-explore buffers, and the explorer acts
    # with the EMA policy snapshotted at spawn time (= the reference's
    # step-S policy). Default off = exact reference interleaving.
    overlap_explore: bool = False

    def resolved_label_freq(self) -> int:
        return self.label_freq or max(int(self.n_train_steps // self.n_saves), 1)


@dataclasses.dataclass
class _ExploreSnapshot:
    """Self-contained randomness + params for one overlapped explore cycle.

    The EMA params are a deep device COPY: the fused train step donates the
    old TrainState (`donate_argnums=(0,)`), so buffers referenced from
    `self.state` at spawn time are invalidated by the very next step — the
    worker must own independent buffers. The key/np_rng streams are consumed
    by the worker thread ONLY (no locking needed); the trainer's own
    `self.rng`/`self.np_rng` stay main-thread-exclusive for the whole cycle.
    """

    ema_params: Any
    key: jax.Array
    np_rng: np.random.Generator

    def next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub


@dataclasses.dataclass
class _VideoPrefetchState:
    """Next cycle's exploration inputs, prepared ahead of time
    (cfg.pipeline_explore): pinned env seeds + start frames + the guidance
    videos as an incrementally-pumped device chain (`VideoSampleStream`)
    or an eager array for video models without the stream API."""

    assignments: list  # [(task, env_idx)]
    seeds: list  # env seed per assignment (reopen pins the scene)
    start_imgs: list  # uint8 start frames rendered at those seeds
    videos: Any  # VideoSampleStream | ndarray | device array

    def pump(self, k: int = 1) -> None:
        if hasattr(self.videos, "pump"):
            self.videos.pump(k)

    def videos_u8(self) -> np.ndarray:
        if hasattr(self.videos, "result_u8"):
            return np.asarray(self.videos.result_u8())
        return np.asarray(self.videos)


class ExploreCycleError(RuntimeError):
    """An exploration cycle failed mid-way. Episodes that completed
    BEFORE the failure ride along in `.outcomes` so callers can commit them
    instead of silently losing finished rollouts (the pre-refactor
    synchronous path committed each episode as it finished)."""

    def __init__(self, cause: BaseException, outcomes):
        super().__init__(f"exploration cycle failed: {cause!r}")
        self.outcomes = outcomes


class IterTypeScheduler:
    """rand-bias/vid-bias two-phase cycle (`update_iter_type`
    `lb_online_trainer_v7.py:942-970`)."""

    def __init__(self, cfg: TrainerConfig):
        self.cfg = cfg
        self.iter_type = "rand-bias"
        self.rand_iter_cnt = 0
        self.vid_iter_cnt = 0

    def update(self, step: int) -> str:
        cfg = self.cfg
        if step < cfg.init_rand_steps:
            self.iter_type = "rand-bias"
        elif step == cfg.init_rand_steps:
            self.rand_iter_cnt = 0
        elif self.rand_iter_cnt == cfg.rand_cycle_steps:
            self.rand_iter_cnt = 0
            self.iter_type = "vid-bias"
        elif self.vid_iter_cnt == cfg.vid_cycle_steps:
            self.vid_iter_cnt = 0
            self.iter_type = "rand-bias"
        if cfg.vid_cycle_steps == 0:
            self.iter_type = "rand-bias"
        elif cfg.rand_cycle_steps == 0:
            self.iter_type = "vid-bias"
        return self.iter_type

    def count(self):
        if self.iter_type == "rand-bias":
            self.rand_iter_cnt += 1
        else:
            self.vid_iter_cnt += 1


class ExploreThrottle:
    """Explore/no-explore alternation per buffer once it is warm
    (`update_explo_type` `lb_online_trainer_v7.py:432-468`), bounding the
    env-step budget."""

    def __init__(self, cfg: TrainerConfig):
        self.cfg = cfg
        self.explo_type_rand = "explo"
        self.explo_type_vid = "explo"
        self.cnt_exp_rand = self.cnt_no_exp_rand = 0
        self.cnt_exp_vid = self.cnt_no_exp_vid = 0

    def update(self, len_rand: int, len_vid: int):
        cfg = self.cfg
        if not cfg.enable_noExp:
            return
        if len_rand >= cfg.noExp_start_buf_len_rand:
            if self.explo_type_rand == "no-explo":
                self.cnt_no_exp_rand += 1
            else:
                self.cnt_exp_rand += 1
        if self.cnt_exp_rand == cfg.Exp_noExp_rand[0]:
            self.cnt_exp_rand = 0
            self.explo_type_rand = "no-explo"
        if self.cnt_no_exp_rand == cfg.Exp_noExp_rand[1]:
            self.cnt_no_exp_rand = 0
            self.explo_type_rand = "explo"

        if len_vid >= cfg.noExp_start_buf_len_vid:
            if self.explo_type_vid == "no-explo":
                self.cnt_no_exp_vid += 1
            else:
                self.cnt_exp_vid += 1
            if self.cnt_exp_vid == cfg.Exp_noExp_vid[0]:
                self.cnt_exp_vid = 0
                self.explo_type_vid = "no-explo"
            if self.cnt_no_exp_vid == cfg.Exp_noExp_vid[1]:
                self.cnt_no_exp_vid = 0
                self.explo_type_vid = "explo"


class OnlineTrainer:
    """Owns the buffers, schedulers, train state, and the env list."""

    def __init__(
        self,
        policy: DiffusionPolicy,
        env_list: EnvList,
        config: TrainerConfig,
        workdir: str,
        video_model=None,  # object with .sample(rng, imgs01, tasks) -> (B,F,H,W,3) float01
        explore_config: Optional[ExploreConfig] = None,
        opt_config: Optional[OptimizerConfig] = None,
        ema_config: Optional[EMAConfig] = None,
        seed: int = 0,
        act_min: Optional[np.ndarray] = None,
        act_max: Optional[np.ndarray] = None,
        mesh=None,  # jax.sharding.Mesh: 'dp'/'dp_*' axes for DP, 'tp' for TP
        env_pool=None,  # EnvWorkerPool: parallel exploration workers
        tp_min_size: int = 256,  # smallest trailing dim sharded over 'tp'
    ):
        self.policy = policy
        self.envs = env_list
        self.cfg = config
        self.video_model = video_model
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

        self.envBuf_rand = ReplayBuffer(
            config.max_episodes_rand, config.max_len_uB, config.min_len_uB,
            sample_act_seq_len=config.model_act_horizon,
        )
        self.envBuf_vid = ReplayBuffer(
            config.max_episodes_vid, config.max_len_uB, config.min_len_uB,
            sample_act_seq_len=config.model_act_horizon,
        )

        self.iter_sched = IterTypeScheduler(config)
        self.throttle = ExploreThrottle(config)
        self.metrics = MetricsLogger(workdir)
        self.metrics.init_per_task_metrics(env_list.task_list)
        self.np_rng = np.random.default_rng(seed)
        self.rng = jax.random.PRNGKey(seed)
        # Guidance-video keys come from a counter-indexed stream SEPARATE
        # from the policy/train key order: pipelined exploration
        # (cfg.pipeline_explore) draws the next cycle's video key one cycle
        # early, and fold_in-by-counter makes that reordering invisible —
        # cycle i's videos are bit-identical pipelined or serial
        # (tests/test_explore_pipeline.py episode equivalence).
        self.rng, self._video_key_base = jax.random.split(self.rng)
        self._video_key_idx = 0

        # device state; with a mesh, batches split along the dp axes and XLA
        # compiles the grad all-reduce onto ICI (SURVEY §2.11: the
        # reference's Accelerate DP is degenerate single-process — here it
        # is real). A 'tp' mesh axis additionally shards wide parameter /
        # optimizer-moment trailing dims across chips (tensor parallelism);
        # GSPMD inserts the activation collectives from the shardings.
        self.mesh = mesh
        tx = make_optimizer(opt_config or OptimizerConfig())
        self.rng, init_rng = jax.random.split(self.rng)
        params = policy.init(init_rng)
        self.state = TrainState.create(params, tx)
        if mesh is not None:
            from v2a_tpu.parallel.sharding import (
                dp_axis_names, shard_train_state,
            )

            dp_total = int(
                np.prod([mesh.shape[a] for a in dp_axis_names(mesh)])
            )
            if config.buf_sample_batch_size % dp_total != 0:
                raise ValueError(
                    f"batch {config.buf_sample_batch_size} not divisible by "
                    f"dp={dp_total}"
                )
            self.state = shard_train_state(
                self.state, mesh, min_size=tp_min_size
            )
        self._train_step = jax.jit(
            make_train_step(
                policy.loss, tx, ema_config or EMAConfig(),
                accumulate=config.gradient_accumulate_every,
            ),
            donate_argnums=(0,),
        )
        self._predict_ddim = jax.jit(
            lambda p, r, obs: policy.predict_action(p, r, obs, use_ddim=True)
        )

        self.explore_cfg = explore_config or ExploreConfig(
            n_acts_per_pred=policy.config.n_action_steps,
            is_stop_at_suc=config.is_stop_at_suc,
        )
        self.executor = GuidedRolloutExecutor(
            env_list, self._ema_policy_fn, self.explore_cfg, self.np_rng
        )
        self.env_pool = env_pool
        self._batched_executor = None
        if env_pool is not None:
            from v2a_tpu.train.explore_batched import (
                BatchedGuidedRolloutExecutor,
            )

            self._batched_executor = BatchedGuidedRolloutExecutor(
                env_pool, self._ema_policy_fn_batch, self.explore_cfg,
                env_list.task_to_task_idx, policy.config.action_dim,
            )

        self.act_min = (
            act_min if act_min is not None
            else np.full(policy.config.action_dim, -1.0, np.float32)
        )
        self.act_max = (
            act_max if act_max is not None
            else np.full(policy.config.action_dim, 1.0, np.float32)
        )

        # host-side counters (checkpointed; `lb_online_trainer_v7.py:367-385`)
        self.num_steps_in_env = 0
        self.cnt_explore_suc = 0
        self.cnt_vid_rollouts = 0
        self.cnt_vid_rout_per_tk = {tk: 0 for tk in env_list.task_list}
        self.cnt_explo_suc_per_tk = {tk: 0 for tk in env_list.task_list}
        self.h5_randsam_start_idx = 0
        self.is_all_randsam_visited = False
        # (pred_video, rollout imgs) of the latest guided episode, for the
        # debug composite
        self._last_rollout = None
        self._prefetch = None
        # pipelined-exploration prefetch (cfg.pipeline_explore)
        self._video_prefetch: Optional[_VideoPrefetchState] = None
        # overlapped-exploration state (cfg.overlap_explore)
        self._explore_thread: Optional[threading.Thread] = None
        self._explore_outcome: Optional[dict] = None
        self._explore_snapshot: Optional[_ExploreSnapshot] = None

    # -- policy access for exploration -----------------------------------

    def _on_explore_worker(self) -> bool:
        """True iff the caller IS the overlapped-exploration worker thread.
        Dispatching on thread identity (not snapshot presence) keeps the
        worker's private key stream worker-exclusive: a main-thread caller
        (e.g. a future eval hook) while a cycle is in flight must use the
        live state, not race on the snapshot's streams."""
        return (
            self._explore_thread is not None
            and threading.current_thread() is self._explore_thread
        )

    def _explore_params_and_key(self):
        """(ema_params, rng key) for one exploration-time policy call.

        On the overlapped worker thread this is the spawn-time snapshot
        (donation-safe copy + private key stream); on the main thread the
        live state and the trainer's main key are used."""
        if self._on_explore_worker():
            snap = self._explore_snapshot
            return snap.ema_params, snap.next_key()
        self.rng, sub = jax.random.split(self.rng)
        return self.state.ema_params, sub

    def _ema_policy_fn(self, img_obs01: np.ndarray, img_goal01: np.ndarray):
        """Predict `n_action_steps` actions from the EMA params, DDIM."""
        params, sub = self._explore_params_and_key()
        obs = {
            "img_obs_1": jnp.asarray(img_obs01),
            "img_goal_1": jnp.asarray(img_goal01),
        }
        out = self._predict_ddim(params, sub, obs)
        # pipelined exploration: slot one prefetched-video chunk behind the
        # just-dispatched policy program (FIFO: the policy result is not
        # delayed; the chunk runs while the host executes sim steps)
        self._pump_video_prefetch()
        return np.asarray(out["action"][0])

    def _ema_policy_fn_batch(self, img_obs01: np.ndarray, img_goal01: np.ndarray):
        """Batched variant: (N,H,W,3)x2 -> (N, n_action_steps, Da), one
        compiled DDIM chain for all parallel rollouts."""
        params, sub = self._explore_params_and_key()
        obs = {
            "img_obs_1": jnp.asarray(img_obs01),
            "img_goal_1": jnp.asarray(img_goal01),
        }
        out = self._predict_ddim(params, sub, obs)
        self._pump_video_prefetch()
        return np.asarray(out["action"])

    # -- data -------------------------------------------------------------

    @property
    def step(self) -> int:
        return int(self.state.step)

    def ingest_h5(self, start: int, end: int):
        if not self.cfg.randsam_path:
            return
        steps = add_episodes_to_buffer(
            self.cfg.randsam_path, self.envBuf_rand, self.envs.task_list,
            start, end, self.act_min, self.act_max,
            cam=self.envs.camera_list[0],
            env_idx_per_task={
                tk: self.envs.seed_sets[tk][0] for tk in self.envs.task_list
            },
            count_env_steps=not self.is_all_randsam_visited,
        )
        self.num_steps_in_env += steps

    def live_rand_explore(self, n_ep_per_task: int):
        """Collect random-action episodes directly in the envs (the 'live'
        alternative to HDF5 ingestion; sampler semantics from
        `environment/libero/lb_data/lb_randsam_utils.py:5-167`)."""
        from v2a_tpu.envs.randsam import RandSamConfig, rand_sample_1_ep

        rcfg = RandSamConfig(rand_ep_len=self.cfg.live_rand_ep_len)
        cam = self.envs.camera_list[0]
        for task in self.envs.task_list:
            env_idx = self.envs.seed_sets[task][0]
            for _ in range(n_ep_per_task):
                self.envs.init_1_given_env(task, env_idx, is_rand=True)
                imgs, acts, _ = rand_sample_1_ep(
                    self.envs, task, env_idx, rcfg, self.np_rng, cam
                )
                self.envs.close_1_given_env(task, env_idx)
                self.envBuf_rand.add_episode(task, cam, env_idx, imgs, acts)
                self.num_steps_in_env += len(acts)

    def sample_from_bufs(self, np_rng=None) -> Dict[str, np.ndarray]:
        """Mixed-buffer sampling (`sample_from_bufs`
        `lb_online_trainer_v7.py:787-851`). `np_rng` overrides the trainer's
        generator (the prefetch worker thread passes its own)."""
        cfg = self.cfg
        rng = np_rng if np_rng is not None else self.np_rng
        bs = cfg.buf_sample_batch_size
        if len(self.envBuf_vid) == 0:
            return self.envBuf_rand.sample_batch(bs, rng)
        if len(self.envBuf_rand) == 0:
            return self.envBuf_vid.sample_batch(bs, rng)

        if cfg.buf_sample_method == "rand_prob":
            probs = rng.uniform(size=bs)
            n_rands = int((probs < cfg.buf_sample_randBuf_prob).sum())
        elif cfg.buf_sample_method == "iter_bias_fix":
            ratio = (
                cfg.buf_sample_ratio_rand
                if self.iter_sched.iter_type == "rand-bias"
                else cfg.buf_sample_ratio_vid
            )
            n_rands = int(round(bs * ratio[0]))
        else:
            raise NotImplementedError(cfg.buf_sample_method)
        n_vids = bs - n_rands
        parts = []
        if n_rands:
            parts.append(self.envBuf_rand.sample_batch(n_rands, rng))
        if n_vids:
            parts.append(self.envBuf_vid.sample_batch(n_vids, rng))
        return merge_batches(parts) if len(parts) > 1 else parts[0]

    def to_device_batch(self, host_batch: Dict[str, np.ndarray]):
        """uint8 images -> [0,1] float on device; the layout consumed by
        `policy.loss` (`to_batch_dict` `lb_online_trainer_v7.py:1296-1310`).
        With a mesh, arrays are device_put sharded along 'dp' as uint8 (4x
        less ICI/PCIe traffic) and scaled on device."""
        batch = {
            "obs": {
                "img_obs_1": host_batch["img_obs"],
                "img_goal_1": host_batch["img_goal"],
            },
            "action": host_batch["action"],
        }
        if self.mesh is not None:
            from v2a_tpu.parallel.sharding import shard_batch

            batch = shard_batch(batch, self.mesh)
        return {
            "obs": {
                k: jnp.asarray(v).astype(jnp.float32) / 255.0
                for k, v in batch["obs"].items()
            },
            "action": jnp.asarray(batch["action"]),
        }

    # -- exploration ------------------------------------------------------

    def _sample_videos_u8(self, rng, start_imgs_u8, tasks):
        """Batched guidance-video sampling, quantized to uint8 ON DEVICE
        (4x less device-to-host traffic than the f32 readback the
        reference pays, `lb_online_trainer_v7.py:891-910`). Stub/test
        video models that only expose float `sample()` still work."""
        imgs01 = np.stack(start_imgs_u8).astype(np.float32) / 255.0
        vm = self.video_model
        if hasattr(vm, "sample_u8"):
            return vm.sample_u8(rng, imgs01, tasks)
        v01 = np.asarray(vm.sample(rng, imgs01, tasks))
        return (np.clip(v01, 0.0, 1.0) * 255.0).astype(np.uint8)

    def _next_video_key(self) -> jax.Array:
        """The key for one guidance-video sampling call: fold_in by cycle
        counter, independent of every other key stream (see __init__).
        Consumed by whichever thread runs the cycle — at most one cycle
        (and at most one prefetch) is ever in flight."""
        key = jax.random.fold_in(self._video_key_base, self._video_key_idx)
        self._video_key_idx += 1
        return key

    def _next_parallel_assignments(self):
        """Rotate the task window across cycles so every task gets explored
        even when the pool is smaller than the task list. Advances the
        rotation — call once per (pre)planned cycle."""
        tasks = self.envs.task_list
        n = len(self.env_pool)
        offset = getattr(self, "_pool_task_offset", 0)
        assignments = []
        for i in range(n):
            task = tasks[(offset + i) % len(tasks)]
            assignments.append((task, self.envs.seed_sets[task][0]))
        self._pool_task_offset = (offset + n) % len(tasks)
        return assignments

    # -- pipelined exploration (cfg.pipeline_explore) -----------------------

    def _take_video_prefetch(self) -> Optional[_VideoPrefetchState]:
        stash, self._video_prefetch = self._video_prefetch, None
        return stash

    def _pump_video_prefetch(self) -> None:
        stash = self._video_prefetch
        if stash is not None:
            stash.pump(1)

    def _dispatch_videos(self, start_imgs_u8, tasks):
        """Start one guidance-video sampling chain WITHOUT reading it back:
        a chunked `VideoSampleStream` when the model supports it (pumped at
        each rollout policy call), else the eager one-program path."""
        rng = self._next_video_key()
        vm = self.video_model
        if hasattr(vm, "sample_u8_stream"):
            imgs01 = np.stack(start_imgs_u8).astype(np.float32) / 255.0
            return vm.sample_u8_stream(
                rng, imgs01, list(tasks),
                n_chunks=self.cfg.pipeline_video_chunks,
            )
        return self._sample_videos_u8(rng, start_imgs_u8, tasks)

    def _prefetch_videos(self, assignments) -> _VideoPrefetchState:
        """Render start frames (serial env path) at freshly drawn seeds and
        start the guidance-video chain for those frames."""
        cam = self.envs.camera_list[0]
        seeds, start_imgs = [], []
        for task, env_idx in assignments:
            self.envs.init_1_given_env(task, env_idx, is_rand=True)
            seeds.append(self.envs.actual_env_seeds[(task, env_idx)])
            start_imgs.append(self.envs.render_an_env(task, cam, env_idx))
            self.envs.close_1_given_env(task, env_idx)
        videos = self._dispatch_videos(
            start_imgs, [a[0] for a in assignments]
        )
        return _VideoPrefetchState(list(assignments), seeds, start_imgs, videos)

    def _prefetch_videos_pool(self, assignments) -> _VideoPrefetchState:
        """Pool variant of `_prefetch_videos`: render in the workers, then
        CLOSE the envs (they reopen at the pinned seeds at rollout time, so
        the envs stay free for live rand / eval between cycles)."""
        pool = self.env_pool
        cam = self.envs.camera_list[0]
        pool.map([
            (i, "init_1_given_env", (task, env_idx), {"is_rand": True})
            for i, (task, env_idx) in enumerate(assignments)
        ])
        seed_dicts = pool.map([
            (i, "attr:actual_env_seeds", (), {})
            for i, _ in enumerate(assignments)
        ])
        seeds = [
            seed_dicts[i][(task, env_idx)]
            for i, (task, env_idx) in enumerate(assignments)
        ]
        start_imgs = pool.map([
            (i, "render_an_env", (task, cam, env_idx), {})
            for i, (task, env_idx) in enumerate(assignments)
        ])
        pool.map([
            (i, "close_1_given_env", (task, env_idx), {})
            for i, (task, env_idx) in enumerate(assignments)
        ])
        videos = self._dispatch_videos(
            start_imgs, [a[0] for a in assignments]
        )
        return _VideoPrefetchState(list(assignments), seeds, start_imgs, videos)

    def video_guided_explore(self):
        """One exploration cycle over all tasks
        (`video_guided_explore` `lb_online_trainer_v7.py:859-938`):
        rollouts followed by an immediate commit — the reference's
        synchronous interleaving (`:504-507`). On a mid-cycle failure the
        episodes that DID finish are committed before the error surfaces."""
        try:
            outcomes = self._explore_rollouts()
        except ExploreCycleError as exc:
            self._commit_explore(exc.outcomes)
            raise
        self._commit_explore(outcomes)

    def _explore_rollouts(self):
        """Run one exploration cycle and return ``[(task, env_idx, result)]``
        WITHOUT mutating buffers/counters. Side effects live in
        `_commit_explore`, so `cfg.overlap_explore` can run this on a worker
        thread while training keeps sampling the pre-explore buffers."""
        if self.video_model is None:
            raise RuntimeError("no video model attached")
        if self._batched_executor is not None:
            return self._explore_rollouts_parallel()
        self.envs.check_no_envs_exist()
        cam = self.envs.camera_list[0]
        assignments = [
            (task, self.envs.seed_sets[task][0])
            for task in self.envs.task_list
        ]

        if self.cfg.pipeline_explore:
            # pipelined: this cycle's inputs were prepared last cycle; its
            # video chain already ran during that cycle's rollout gaps.
            # Dispatch any chunks still pending, prepare the NEXT cycle's
            # inputs while they run, then read this cycle's videos back.
            stash = self._take_video_prefetch()
            if stash is None:
                stash = self._prefetch_videos(assignments)
            stash.pump(10**9)
            self._video_prefetch = self._prefetch_videos(assignments)
            metas = stash.assignments
            seeds = list(stash.seeds)
            videos_u8 = stash.videos_u8()
        else:
            # batch ALL task start frames into one video-model call — the
            # reference loops bs=1 (`:871-877`); batching is the first TPU
            # win.
            start_imgs = []
            metas = assignments
            seeds = []
            for task, env_idx in metas:
                self.envs.init_1_given_env(task, env_idx, is_rand=True)
                seeds.append(self.envs.actual_env_seeds[(task, env_idx)])
                start_imgs.append(self.envs.render_an_env(task, cam, env_idx))
                self.envs.close_1_given_env(task, env_idx)

            vid_rng = self._next_video_key()
            videos_u8 = np.asarray(self._sample_videos_u8(
                vid_rng, np.stack(start_imgs), [m[0] for m in metas]
            ))

        # overlapped cycles give the executor a private numpy stream so the
        # trainer's generator stays main-thread-exclusive
        old_ex_rng = None
        if self._on_explore_worker():
            old_ex_rng, self.executor.rng = (
                self.executor.rng, self._explore_snapshot.np_rng
            )
        outcomes = []
        try:
            for (task, env_idx), video, seed in zip(metas, videos_u8, seeds):
                # Re-create the env with the SAME seed that produced the
                # frame the guidance video was conditioned on: Libero
                # randomizes object placement per seed, so a fresh random
                # seed here would make the policy chase goals from a
                # different scene than the one it acts in (the reference
                # keeps one env alive throughout,
                # `lb_online_trainer_v7.py:877-919`; the lazy close/reopen
                # around the batched video call must preserve that scene).
                # The seed was captured at render time (not read from
                # `actual_env_seeds` now): with pipeline_explore another
                # consumer (live rand) may have re-seeded this env since.
                self.envs.init_1_given_env(task, env_idx, e_seed=seed)
                try:
                    img_start = self.envs.render_an_env(task, cam, env_idx)
                    result = self.executor.execute(
                        task, cam, env_idx, img_start, video
                    )
                finally:
                    # a mid-rollout failure must not leak the env: the next
                    # cycle's check_no_envs_exist would trip long after the
                    # real error if a caught-and-continued exception left
                    # this task open
                    self.envs.close_1_given_env(task, env_idx)
                outcomes.append((task, env_idx, result))
        except Exception as exc:
            # completed rollouts ride along so callers can commit them
            raise ExploreCycleError(exc, outcomes) from exc
        finally:
            if old_ex_rng is not None:
                self.executor.rng = old_ex_rng
        return outcomes

    def _explore_rollouts_parallel(self):
        """Pool-parallel exploration: every worker owns one task's env; ONE
        batched video-model call, then lock-step rollouts with batched
        policy predictions (`train/explore_batched.py`)."""
        pool = self.env_pool
        cam = self.envs.camera_list[0]

        if self.cfg.pipeline_explore:
            stash = self._take_video_prefetch()
            if stash is None:
                stash = self._prefetch_videos_pool(
                    self._next_parallel_assignments()
                )
            stash.pump(10**9)
            self._video_prefetch = self._prefetch_videos_pool(
                self._next_parallel_assignments()
            )
            assignments = stash.assignments
            start_imgs = stash.start_imgs
            videos_u8 = stash.videos_u8()
            # reopen at the pinned seeds: same scene as the rendered frame
            pool.map([
                (i, "init_1_given_env", (task, env_idx),
                 {"e_seed": stash.seeds[i]})
                for i, (task, env_idx) in enumerate(assignments)
            ])
        else:
            assignments = self._next_parallel_assignments()
            # concurrent env init + start-frame render in the workers
            pool.map([
                (i, "init_1_given_env", (task, env_idx),
                 {"is_rand": True})
                for i, (task, env_idx) in enumerate(assignments)
            ])
            start_imgs = pool.map([
                (i, "render_an_env", (task, cam, env_idx), {})
                for i, (task, env_idx) in enumerate(assignments)
            ])

            vid_rng = self._next_video_key()
            videos_u8 = np.asarray(self._sample_videos_u8(
                vid_rng, np.stack(start_imgs), [a[0] for a in assignments]
            ))

        seed_rng = (
            self._explore_snapshot.np_rng
            if self._on_explore_worker() else self.np_rng
        )
        seeds = [
            int(seed_rng.integers(0, 2**31 - 1)) for _ in range(len(assignments))
        ]
        results = self._batched_executor.execute_all(
            assignments, cam, start_imgs, list(videos_u8), seeds
        )
        pool.map([
            (i, "close_1_given_env", (task, env_idx), {})
            for i, (task, env_idx) in enumerate(assignments)
        ])
        return [
            (task, env_idx, result)
            for (task, env_idx), result in zip(assignments, results)
        ]

    def _commit_explore(self, outcomes):
        """Apply an exploration cycle's side effects — buffer appends,
        counters, the debug composite (`lb_online_trainer_v7.py:919-938`).
        MAIN THREAD ONLY: this is the single place exploration touches
        state shared with the train loop."""
        cam = self.envs.camera_list[0]
        for task, env_idx, result in outcomes:
            self._last_rollout = (result.pred_video, result.imgs)
            self.envBuf_vid.add_episode(
                task, cam, env_idx, result.imgs, result.acts,
                is_success=result.is_success,
            )
            self.num_steps_in_env += result.n_env_steps
            self.cnt_vid_rollouts += 1
            self.cnt_vid_rout_per_tk[task] += 1
            if result.is_success:
                self.cnt_explore_suc += 1
                self.cnt_explo_suc_per_tk[task] += 1

    # -- overlapped exploration (cfg.overlap_explore) ----------------------

    def _spawn_explore(self):
        """Start one exploration cycle on a worker thread.

        The worker acts with the EMA policy snapshotted NOW (a deep device
        copy — the donated train step invalidates the live state's buffers
        on its next call) and private RNG streams; its device calls simply
        interleave with the train step's on the chip. Episodes are committed
        by the main thread at `_join_explore`."""
        assert self._explore_thread is None, "explore cycle already in flight"
        self.rng, key = jax.random.split(self.rng)
        self._explore_snapshot = _ExploreSnapshot(
            ema_params=jax.tree_util.tree_map(jnp.copy, self.state.ema_params),
            key=key,
            np_rng=np.random.default_rng(
                int(self.np_rng.integers(0, 2**63 - 1))
            ),
        )
        outcome: dict = {}
        self._explore_outcome = outcome

        def work():
            try:
                outcome["res"] = self._explore_rollouts()
            except BaseException as exc:  # surfaced at the join barrier
                outcome["err"] = exc

        self._explore_thread = threading.Thread(
            target=work, name="v2a-explore", daemon=True
        )
        self._explore_thread.start()

    def _join_explore(self):
        """Barrier: wait for an in-flight overlapped cycle and commit its
        episodes. Flushes the prefetcher first so training only samples
        post-commit buffers (same contract as the synchronous path).
        No-op when nothing is in flight."""
        if self._explore_thread is None:
            return
        self._explore_thread.join()
        outcome = self._explore_outcome
        self._explore_thread = None
        self._explore_outcome = None
        self._explore_snapshot = None
        if "err" in outcome:
            err = outcome["err"]
            if isinstance(err, ExploreCycleError) and err.outcomes:
                self._flush_prefetch()
                self._commit_explore(err.outcomes)
            raise err
        self._flush_prefetch()
        self._commit_explore(outcome["res"])

    # -- debug artifacts ---------------------------------------------------

    def dump_debug_images(self, n: int = 8):
        """Periodic visual artifacts: buffer start/goal pairs and the latest
        exploration pred-video-vs-rollout composite
        (`lb_online_trainer_v7.py:541-583, 1266-1284`). Written under
        workdir/debug/."""
        from v2a_tpu.data.img_utils import save_episode_png

        out_dir = os.path.join(self.workdir, "debug")
        for name, buf in (("rand", self.envBuf_rand), ("vid", self.envBuf_vid)):
            if len(buf) == 0:
                continue
            batch = buf.sample_batch(n, self.np_rng)
            pairs = np.concatenate(
                [batch["img_obs"], batch["img_goal"]], axis=1
            )  # stack obs over goal vertically
            save_episode_png(
                os.path.join(out_dir, f"buf_{name}_step{self.step}.png"),
                pairs,
            )
        if self._last_rollout is not None:
            pred, rollout = self._last_rollout
            # guidance frames on top, evenly-spaced executed frames below
            idxs = np.linspace(0, len(rollout) - 1, len(pred)).astype(int)
            composite = np.concatenate(
                [pred, rollout[idxs]], axis=1
            )
            save_episode_png(
                os.path.join(out_dir, f"rollout_step{self.step}.png"),
                composite, max_frames=len(pred),
            )

    # -- checkpointing ----------------------------------------------------

    def _counters(self) -> dict:
        return dict(
            num_steps_in_env=self.num_steps_in_env,
            cnt_explore_suc=self.cnt_explore_suc,
            cnt_vid_rollouts=self.cnt_vid_rollouts,
            cnt_vid_rout_per_tk=self.cnt_vid_rout_per_tk,
            cnt_explo_suc_per_tk=self.cnt_explo_suc_per_tk,
            h5_randsam_start_idx=self.h5_randsam_start_idx,
            is_all_randsam_visited=self.is_all_randsam_visited,
        )

    def save(self, label: Optional[int] = None):
        # a checkpoint taken while an overlapped cycle is in flight would
        # exclude that cycle's episodes and counters (num_steps_in_env,
        # cnt_vid_rollouts) — a crash before the join would silently
        # undercount the env-step budget on resume. Join first.
        self._join_explore()
        label = label if label is not None else (
            self.step // self.cfg.resolved_label_freq()
            * self.cfg.resolved_label_freq()
        )
        ckpt.save_checkpoint(
            self.workdir, label, self.state, extra=self._counters(),
            n_saves=self.cfg.n_saves,
        )
        if self.cfg.checkpoint_buffers:
            self.envBuf_rand.save(os.path.join(self.workdir, "buf_rand.npz"))
            self.envBuf_vid.save(os.path.join(self.workdir, "buf_vid.npz"))

    def load(self, label: Optional[int] = None):
        # a stash prepared pre-restore pins seeds/frames from the aborted
        # run; drop it so the next cycle re-renders
        self._video_prefetch = None
        self.state, extra = ckpt.restore_checkpoint(
            self.workdir, self.state, label
        )
        for key in (
            "num_steps_in_env", "cnt_explore_suc", "cnt_vid_rollouts",
            "h5_randsam_start_idx", "is_all_randsam_visited",
        ):
            if key in extra:
                setattr(self, key, extra[key])
        for key in ("cnt_vid_rout_per_tk", "cnt_explo_suc_per_tk"):
            if key in extra:
                getattr(self, key).update(extra[key])
        if self.cfg.checkpoint_buffers:
            for name, buf in (
                ("buf_rand.npz", self.envBuf_rand),
                ("buf_vid.npz", self.envBuf_vid),
            ):
                path = os.path.join(self.workdir, name)
                if os.path.exists(path) and len(buf) == 0:
                    buf.load(path)

    # -- the loop ---------------------------------------------------------

    def _sample_device_batch(self, np_rng=None):
        """One ready-to-train device batch (incl. grad-accum stacking)."""
        ga = self.cfg.gradient_accumulate_every
        if ga == 1:
            return self.to_device_batch(self.sample_from_bufs(np_rng))
        micro = [
            self.to_device_batch(self.sample_from_bufs(np_rng))
            for _ in range(ga)
        ]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *micro
        )

    def _start_prefetch(self):
        if self.cfg.prefetch_depth > 0 and self._prefetch is None:
            from v2a_tpu.parallel.prefetch import PrefetchIterator

            # dedicated RNG: the worker thread must not share the trainer's
            # numpy generator with the main thread
            pf_rng = np.random.default_rng(
                int(self.np_rng.integers(0, 2**63 - 1))
            )
            self._prefetch = PrefetchIterator(
                lambda: self._sample_device_batch(pf_rng), depth=self.cfg.prefetch_depth
            )

    def _flush_prefetch(self):
        """Stop and drain in-flight batches; call before mutating buffers."""
        if self._prefetch is not None:
            self._prefetch.stop()
            self._prefetch = None

    def train(self, n_steps: Optional[int] = None):
        cfg = self.cfg
        n_steps = n_steps or cfg.n_train_steps
        timer = Timer()

        if len(self.envBuf_rand) == 0:
            if cfg.randsam_path and cfg.rand_explo_type == "from_h5":
                self.ingest_h5(0, cfg.num_init_rand_ep_per_tk)
                self.h5_randsam_start_idx = cfg.num_init_rand_ep_per_tk
            else:
                self.live_rand_explore(max(cfg.num_init_rand_ep_per_tk // 25, 1))

        try:
            self._train_loop(cfg, n_steps, timer)
        finally:
            try:
                # commit (or surface the error of) any in-flight overlapped
                # exploration so its episodes are not lost on exit
                self._join_explore()
            finally:
                self._flush_prefetch()

    def _train_loop(self, cfg, n_steps, timer):
        while self.step < n_steps:
            step = self.step
            self.iter_sched.update(step)
            self.throttle.update(len(self.envBuf_rand), len(self.envBuf_vid))

            do_vid_explore = (
                self.video_model is not None
                and step > cfg.init_rand_steps
                and step % cfg.video_explo_freq == 0
                and self.throttle.explo_type_vid == "explo"
            )
            do_rand_explore = (
                step > cfg.init_rand_steps
                and step % cfg.rand_explo_freq == 0
                and self.throttle.explo_type_rand == "explo"
            )
            # overlapped exploration: commit a finished cycle promptly so
            # training sees fresh episodes at the earliest safe point
            if (self._explore_thread is not None
                    and not self._explore_thread.is_alive()):
                self._join_explore()

            # live rand exploration shares envs/executor with the explore
            # worker, so a video cycle must not overlap it this step
            overlap_vid = (
                cfg.overlap_explore
                and do_vid_explore
                and not (do_rand_explore and cfg.rand_explo_type == "live")
            )

            if (do_vid_explore and not overlap_vid) or do_rand_explore:
                # exploration / ingestion mutate the buffers: join any
                # in-flight cycle and drop prefetched batches so training
                # only sees post-mutation data
                self._join_explore()
                self._flush_prefetch()

            if do_vid_explore:
                if overlap_vid:
                    self._join_explore()  # at most one cycle in flight
                    self._spawn_explore()
                else:
                    self.video_guided_explore()

            if do_rand_explore:
                if cfg.randsam_path and cfg.rand_explo_type == "from_h5":
                    # circular sweep over the per-task H5 episodes (`:511-526`)
                    st = self.h5_randsam_start_idx % cfg.h5_total_num_ep_per_task
                    n_add = min(
                        cfg.h5_total_num_ep_per_task - st,
                        cfg.rand_explo_num_ep_per_tk,
                    )
                    self.ingest_h5(st, st + n_add)
                    self.h5_randsam_start_idx += n_add
                    if self.h5_randsam_start_idx >= cfg.h5_total_num_ep_per_task:
                        self.is_all_randsam_visited = True
                elif cfg.rand_explo_type == "live":
                    self.live_rand_explore(cfg.rand_explo_num_ep_per_tk)

            self.iter_sched.count()

            if cfg.prefetch_depth > 0:
                self._start_prefetch()
                batch = next(self._prefetch)
            else:
                batch = self._sample_device_batch()
            self.rng, sub = jax.random.split(self.rng)
            self.state, loss, grad_norm = self._train_step(self.state, sub, batch)
            new_step = self.step

            if new_step % cfg.save_freq == 0 or new_step == 1:
                self.save()

            if cfg.debug_img_freq and new_step % cfg.debug_img_freq == 0:
                self.dump_debug_images()

            if new_step % cfg.log_freq == 0 or new_step == 1:
                metrics = {
                    "train/loss": float(loss),
                    "train/grad_norm": float(grad_norm),
                    "train/num_steps_in_env": self.num_steps_in_env,
                    "train/cnt_explore_suc": self.cnt_explore_suc,
                    "buf/len_envBuf_rand": len(self.envBuf_rand),
                    "buf/len_envBuf_vid": len(self.envBuf_vid),
                    "explo/cnt_vid_rollouts": self.cnt_vid_rollouts,
                    "time/step_interval": timer(),
                }
                for tk in self.cnt_vid_rout_per_tk:
                    roll_key, suc_key = per_task_metric_names(tk)
                    metrics[roll_key] = self.cnt_vid_rout_per_tk[tk]
                    metrics[suc_key] = self.cnt_explo_suc_per_tk[tk]
                self.metrics.log(metrics, new_step)
