"""Shared plumbing for the guided-diffusion CLIs (`scripts/guided/*`).

Counterpart of the glue the reference CLIs pull from `dist_util` /
`script_util` (`flowdiffusion/guided_diffusion/scripts/*.py`): flag
handling, parameter init/restore, and npz sample writing."""

from __future__ import annotations

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

TRAIN_DEFAULTS = dict(
    data_dir="",
    schedule_sampler="uniform",
    lr=1e-4,
    weight_decay=0.0,
    lr_anneal_steps=0,
    batch_size=1,
    microbatch=-1,
    ema_rate="0.9999",
    log_interval=10,
    save_interval=10_000,
    resume_checkpoint="",
    use_fp16=False,
    out_dir="guided_out",
    max_steps=0,  # 0 = run to lr_anneal_steps (reference runs unbounded)
    seed=0,
)


def init_or_restore(model, resume_checkpoint: str, *example_args, **kw):
    """Init Flax params, or unpickle a `GuidedTrainLoop.save` snapshot."""
    if resume_checkpoint:
        with open(resume_checkpoint, "rb") as f:
            return pickle.load(f)
    return model.init(jax.random.PRNGKey(0), *example_args, **kw)


def load_params(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def example_image_args(image_size: int, in_channels: int = 3):
    x = jnp.zeros((1, image_size, image_size, in_channels))
    t = jnp.zeros((1,), jnp.int32)
    return x, t


def save_samples_npz(out_dir: str, images: np.ndarray, labels=None) -> str:
    """uint8 NHWC npz batch, the evaluator-CLI input format
    (`scripts/image_sample.py:69-88`, consumed by
    `scripts/evaluate_samples.py`)."""
    os.makedirs(out_dir, exist_ok=True)
    arr = np.clip((images + 1.0) * 127.5, 0, 255).astype(np.uint8)
    shape_str = "x".join(str(s) for s in arr.shape)
    path = os.path.join(out_dir, f"samples_{shape_str}.npz")
    if labels is not None:
        np.savez(path, arr, np.asarray(labels))
    else:
        np.savez(path, arr)
    print(f"saved {path}", flush=True)
    return path


def run_train_loop(loop, max_steps: int):
    steps = max_steps or None
    loop.run_loop(steps)
