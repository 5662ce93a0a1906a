"""Video diffusion model trainer (finetuning / from-scratch capability).

The reference repo freezes its video model and trains it in the sibling
AVDC codebase (`README.md:24`); the vendored `Trainer` in
`flowdiffusion/flowdiffusion/goal_diffusion.py` (and the guided-diffusion
`TrainLoop`, SURVEY §2.9) define the capability surface: EMA'd diffusion
training with gradient clipping, optional loss-aware timestep resampling,
milestone checkpoints. This module is the TPU-native equivalent:

- one fused jitted step (loss + grad + Adam + EMA) with donated buffers,
  bf16 compute / fp32 params,
- data-parallel over a `Mesh` like the policy trainer,
- `VideoClipDataset`: (cond frame, F future frames, task string) clips
  sampled from the same HDF5 episode files the rest of the framework uses,
- optional `LossSecondMomentResampler` hooked through the
  `sample_weights` / per-sample-loss path of `GaussianDiffusion.p_losses`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from v2a_tpu.models.video_model import VideoPredModel
from v2a_tpu.ops.resample import UniformSampler, create_named_schedule_sampler
from v2a_tpu.train import checkpoint as ckpt
from v2a_tpu.train.metrics import MetricsLogger, Timer
from v2a_tpu.train.train_state import EMAConfig, TrainState, ema_decay


@dataclasses.dataclass(frozen=True)
class VideoTrainerConfig:
    """Mirrors the knobs of the AVDC `Trainer.__init__`
    (`goal_diffusion.py` ctor) that matter for training."""

    lr: float = 1e-4
    b1: float = 0.9
    b2: float = 0.99
    grad_clip: float = 1.0
    batch_size: int = 8
    n_train_steps: int = 200_000
    save_freq: int = 5000
    log_freq: int = 100
    n_saves: int = 5
    schedule_sampler: str = "uniform"  # or 'loss-second-moment'
    # Gradient checkpointing (the reference's `use_checkpoint`,
    # `.../guided_diffusion/nn.py:192-236`): rematerialize each U-Net
    # block's activations in the backward pass — the memory lever that
    # lets the 7-frame 128² video U-Net train at real batch sizes in
    # 16 GB HBM, at the cost of an extra forward's FLOPs.
    use_checkpoint: bool = False
    # "blocks" (reference granularity), "levels" (save only resolution-
    # level boundaries; each level incl. its skips recomputes from its
    # entry tag in backward — fits batches block remat cannot hold), or
    # "mxu" (save only conv/dot outputs; GroupNorm/SiLU/softmax chains
    # recompute from them — drops the f32 norm intermediates whose HBM
    # round-trips the round-5 trace attributed ~16% of the B=4 step to)
    remat_policy: str = "blocks"
    # Differentiable Pallas conv routing for the TRAINING step
    # (`VideoUNet.train_fused` -> ops/conv_vjp.py): the ResBlock
    # GN->SiLU->conv3x3 halves run through the row-major fused kernel in
    # forward AND backward(dgrad), eliminating the conv emitter's
    # {3,0,2,1} relayout copies the round-5 trace attributed 16% of the
    # B=4 step to. None = backend default (on for TPU, off for CPU).
    train_fused: Optional[bool] = None


class VideoClipDataset:
    """Samples (x_cond, video, task) clips from HDF5 episode files with the
    layout of `data/h5_ingest.py`: a random episode, a random start frame,
    the next F frames subsampled with stride so clips span real motion."""

    def __init__(
        self,
        h5path: str,
        tasks: Sequence[str],
        frames: int,
        stride: int = 4,
    ):
        import h5py

        self.h5 = h5py.File(h5path, "r")
        self.tasks = [t for t in tasks if t in self.h5]
        if not self.tasks:
            raise ValueError(f"none of the tasks exist in {h5path}")
        self.frames = frames
        self.stride = stride
        self._index: List[Tuple[str, str, int]] = []
        for t in self.tasks:
            for ep in self.h5[t]:
                n = self.h5[t][ep]["agentview_image"].shape[0]
                if n >= frames * stride + 1:
                    self._index.append((t, ep, n))

    def __len__(self):
        return len(self._index)

    def sample_batch(self, batch: int, rng: np.random.Generator):
        f, s = self.frames, self.stride
        conds, vids, tasks = [], [], []
        for _ in range(batch):
            t, ep, n = self._index[rng.integers(len(self._index))]
            start = int(rng.integers(0, n - f * s))
            imgs = self.h5[t][ep]["agentview_image"]
            conds.append(imgs[start])
            vids.append(imgs[start + s : start + s * (f + 1) : s][:f])
            tasks.append(t)
        x_cond = np.stack(conds).astype(np.float32) / 255.0
        video = np.stack(vids).astype(np.float32) / 255.0
        return x_cond, video, tasks


class VideoModelTrainer:
    def __init__(
        self,
        model: VideoPredModel,
        dataset: VideoClipDataset,
        config: Optional[VideoTrainerConfig] = None,
        workdir: str = "logs/video",
        ema_config: Optional[EMAConfig] = None,
        seed: int = 0,
        mesh=None,
    ):
        self.model = model
        self.dataset = dataset
        self.cfg = config or VideoTrainerConfig()
        self.workdir = workdir
        self.mesh = mesh
        self.metrics = MetricsLogger(workdir)
        self.np_rng = np.random.default_rng(seed)
        self.rng = jax.random.PRNGKey(seed)
        self.sampler = create_named_schedule_sampler(
            self.cfg.schedule_sampler, model.diffusion.schedule.num_timesteps
        )

        if model.params is None:
            self.rng, init_rng = jax.random.split(self.rng)
            model.init(init_rng)

        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.grad_clip),
            optax.adam(self.cfg.lr, b1=self.cfg.b1, b2=self.cfg.b2),
        )
        # only the U-Net trains; CLIP text tower stays frozen
        self.state = TrainState.create(model.params["unet"], self.tx)
        if mesh is not None:
            # dp: batches shard over the 'dp' axes (see train()); XLA
            # compiles the gradient all-reduce onto ICI. tp (optional
            # 'tp' axis): wide trailing param/moment dims shard, same
            # leaf rule as the policy trainer (shard_train_state).
            from v2a_tpu.parallel.sharding import shard_train_state

            self.state = shard_train_state(self.state, mesh)
        ema_cfg = ema_config or EMAConfig()

        diffusion = model.diffusion
        # Train through the plain (non-Pallas) module: the fused inference
        # kernels define no VJP (see VideoPredModel._model_fn). Both
        # variants share the identical parameter tree, as does the
        # remat'd (use_checkpoint) variant.
        unet = model.unet
        if getattr(unet, "fused", False):
            unet = unet.clone(fused=False)
        train_fused = self.cfg.train_fused
        if train_fused is None:
            # Measured ladder (PERF.md round 5, on-chip chain medians at
            # release size): B<=4 plain 301.3 -> tfused 267.0 ms/step
            # (+12.8%); at B>=8 the tfused program (with or without block
            # remat) reproducibly kills the remote TPU compile helper
            # (HTTP 500 INTERNAL — the same toolchain blow-up class as
            # "levels"/"mxu" remat at B>=8), so the B>=8 regime stays
            # plain + blocks remat.
            # mesh runs keep the plain path until Pallas-under-pjit
            # partitioning is validated on real multi-chip hardware
            train_fused = (
                jax.default_backend() not in ("cpu",)
                and mesh is None
                and self.cfg.batch_size <= 4
                and not self.cfg.use_checkpoint
            )
        if train_fused and hasattr(unet, "train_fused"):
            unet = unet.clone(train_fused=True)
        if self.cfg.use_checkpoint:
            unet = unet.clone(
                use_checkpoint=True, remat_policy=self.cfg.remat_policy
            )
        self.train_unet = unet  # introspectable (tests/test_remat.py)

        apply_fn = lambda params, x, tt, e: unet.apply(  # noqa: E731
            params, x, tt, e
        )
        if self.cfg.use_checkpoint and self.cfg.remat_policy == "levels":
            # the tags inside __call__ only matter under this wrapper: save
            # ONLY the level-transition tensors; everything else (block
            # interiors AND the skip activations) recomputes per level
            apply_fn = jax.checkpoint(
                apply_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "v2a_level"
                ),
            )
        elif self.cfg.use_checkpoint and self.cfg.remat_policy == "mxu":
            # save ONLY MXU outputs (convs + dots); the module stays plain
            # (`use_checkpoint` compares against "blocks"/"levels" and is a
            # no-op for "mxu"). GroupNorm/SiLU/softmax recompute in backward
            # from the saved conv outputs.
            apply_fn = jax.checkpoint(
                apply_fn,
                policy=lambda prim, *_, **__: prim.name in (
                    "conv_general_dilated", "dot_general"
                ),
            )
        self._train_apply = apply_fn  # introspectable (tests/test_remat.py)

        def train_step(state, rng, video, x_cond, task_embed, t, weights):
            def loss_fn(params):
                return diffusion.p_losses(
                    lambda x, tt, e: apply_fn(params, x, tt, e),
                    rng, video, x_cond, task_embed,
                    t=t, sample_weights=weights, return_per_sample=True,
                )

            (loss, per_sample), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            step = state.step + 1
            decay = ema_decay(step, ema_cfg)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: decay * e + (1.0 - decay) * p,
                state.ema_params, params,
            )
            return (
                state.replace(
                    step=step, params=params, opt_state=opt_state,
                    ema_params=ema_params,
                ),
                loss,
                per_sample,
            )

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

    @property
    def step(self) -> int:
        return int(self.state.step)

    def train(self, n_steps: Optional[int] = None):
        cfg = self.cfg
        n_steps = n_steps or cfg.n_train_steps
        timer = Timer()
        while self.step < n_steps:
            x_cond, video, tasks = self.dataset.sample_batch(
                cfg.batch_size, self.np_rng
            )
            t, weights = self.sampler.sample(cfg.batch_size, self.np_rng)
            task_embed = self.model.encode_batch_text(
                self.model.params, tasks
            )
            x_cond_n = (jnp.asarray(x_cond) * 2.0 - 1.0)[:, None]
            self.rng, sub = jax.random.split(self.rng)
            batch = (jnp.asarray(video), x_cond_n, task_embed,
                     jnp.asarray(t), jnp.asarray(weights))
            if self.mesh is not None:
                from v2a_tpu.parallel.sharding import shard_batch

                batch = shard_batch(batch, self.mesh)
            self.state, loss, per_sample = self._train_step(
                self.state, sub, *batch,
            )
            self.sampler.update_with_losses(t, np.asarray(per_sample))

            step = self.step
            if step % cfg.save_freq == 0 or step == n_steps:
                self.save()
            if step % cfg.log_freq == 0 or step == 1:
                self.metrics.log(
                    {
                        "video_train/loss": float(loss),
                        "time/step_interval": timer(),
                    },
                    step,
                )
        # publish trained EMA weights back into the model
        self.model.params = dict(self.model.params, unet=self.state.ema_params)

    def save(self):
        label = self.step // max(
            self.cfg.n_train_steps // self.cfg.n_saves, 1
        ) * max(self.cfg.n_train_steps // self.cfg.n_saves, 1)
        ckpt.save_checkpoint(
            self.workdir, label, self.state, extra={},
            n_saves=self.cfg.n_saves,
        )

    def load(self, label: Optional[int] = None):
        self.state, _ = ckpt.restore_checkpoint(self.workdir, self.state, label)
