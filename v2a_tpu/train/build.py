"""Experiment factory: config tree -> env list, policy, video model, trainer.

The composition the reference spreads across `scripts/train_libero_dp.py:
29-167` (dataset ctor, `lb_get_video_model_gcp_v2`, `Init_Diffusion_Policy`,
trainer `Config` call) lives here as one function so the train entry, the
eval entry, and the tests build experiments identically.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from v2a_tpu.config.experiment import ExperimentConfig, save_snapshot
from v2a_tpu.envs.base import EnvList
from v2a_tpu.models.policy import DiffusionPolicy
from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel
from v2a_tpu.train.trainer import OnlineTrainer


def build_env_list(cfg: ExperimentConfig) -> EnvList:
    """Resolve `cfg.dataset` through the env registry; fall back to a fake
    list sized like the config when the name is unregistered and the
    backend is 'fake'."""
    from v2a_tpu.envs.registration import _REGISTRY, make_env_list

    if cfg.dataset in _REGISTRY:
        return make_env_list(cfg.dataset)
    if cfg.env_backend == "fake":
        from v2a_tpu.envs.fake import FakeEnvList

        return FakeEnvList(num_tasks=2, img_hw=tuple(cfg.policy.image_size))
    raise KeyError(
        f"env list {cfg.dataset!r} is not registered and backend is "
        f"{cfg.env_backend!r}"
    )


def make_video_model(
    cfg: ExperimentConfig, rng: Optional[jax.Array] = None
) -> VideoPredModel:
    """Build the frozen video model and load converted params when the
    checkpoint directory holds them (`lb_get_video_model_gcp_v2`,
    `diffuser/libero/lb_video_model_utils.py:13-66`)."""
    model = VideoPredModel(cfg.video)
    ckpt = os.path.join(
        cfg.video_ckpt_dir, f"jax-model-{cfg.video_ckpt_milestone}.msgpack"
    )
    if os.path.exists(ckpt):
        model.load_converted(
            ckpt,
            tokenizer_dir=os.path.join(cfg.video_ckpt_dir, "tokenizer"),
            rng=rng,
        )
    else:
        model.init(rng if rng is not None else jax.random.PRNGKey(0))
    return model


def build_experiment(
    cfg: ExperimentConfig,
    workdir: Optional[str] = None,
    with_video_model: bool = True,
    snapshot: bool = True,
) -> Tuple[OnlineTrainer, DiffusionPolicy, EnvList, Optional[VideoPredModel]]:
    workdir = workdir or cfg.savepath()
    env_list = build_env_list(cfg)
    policy = DiffusionPolicy.create(cfg.policy)
    video_model = None
    if with_video_model:
        if cfg.video_model_kind == "oracle":
            # hermetic scripted goal-frame generator (the learning gate's
            # stand-in for the frozen pretrained model; fake env only)
            if cfg.env_backend != "fake":
                raise ValueError(
                    "video_model_kind='oracle' requires env_backend='fake'"
                )
            from v2a_tpu.envs.fake_oracle import FakeOracleVideoModel

            video_model = FakeOracleVideoModel(
                env_list.task_to_task_idx,
                horizon=cfg.video.video_future_horizon,
            )
        else:
            video_model = make_video_model(cfg)

    mesh = None
    if cfg.mesh_axes:
        from v2a_tpu.parallel.mesh import make_mesh

        if cfg.mesh_axes == ("auto_dp",):
            mesh = make_mesh(("dp",))
        else:
            mesh = make_mesh(
                tuple(cfg.mesh_axes),
                tuple(cfg.mesh_shape) if cfg.mesh_shape else None,
            )
        if (
            video_model is not None
            and "tp" in mesh.axis_names
            and hasattr(video_model, "shard_for_mesh")  # oracle: host-side
        ):
            video_model.shard_for_mesh(mesh)

    env_pool = None
    if cfg.n_env_workers > 0:
        from v2a_tpu.envs.subproc import EnvWorkerPool

        env_pool = EnvWorkerPool(cfg.dataset, cfg.n_env_workers)

    trainer = OnlineTrainer(
        policy=policy,
        env_list=env_list,
        config=cfg.trainer,
        workdir=workdir,
        video_model=(
            video_model
            if cfg.video_model_kind == "oracle"  # already host-protocol
            else _VideoSampleAdapter(video_model) if video_model else None
        ),
        explore_config=cfg.explore,
        opt_config=cfg.opt,
        ema_config=cfg.ema,
        seed=cfg.seed,
        mesh=mesh,
        env_pool=env_pool,
    )
    if snapshot:
        save_snapshot(cfg, workdir)
    return trainer, policy, env_list, video_model


class _VideoSampleAdapter:
    """Adapts VideoPredModel.sample to the trainer's video-model protocol
    (`.sample(rng, imgs01, tasks) -> (B, F, H, W, 3) float01`)."""

    def __init__(self, model: VideoPredModel):
        self.model = model

    def sample(self, rng, imgs01: np.ndarray, tasks):
        return np.asarray(self.model.sample(rng, imgs01, list(tasks)))
