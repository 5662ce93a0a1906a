"""Standalone video-model training CLI.

The reference trains its video model in the AVDC codebase: a driver
script builds `GoalGaussianDiffusion` + `Trainer`
(`flowdiffusion/flowdiffusion/goal_diffusion.py:762-1055`: Accelerate
DDP, EMA, milestone checkpoints, Adam(lr=1e-4), periodic sampling) and
calls `trainer.train()`. This is the TPU-native entry for the same
capability: `VideoClipDataset` over the framework's HDF5 episode files,
`VideoModelTrainer` (fused donated train step, EMA, loss-aware timestep
resampling, gradient checkpointing), optional dp x tp `Mesh` sharding,
milestone checkpoint/resume, and a post-training validation sample.

Examples:
    python scripts/train_video.py --data clips.hdf5 --workdir logs/vid \
        --batch-size 8 --n-steps 200000 --use-checkpoint
    python scripts/train_video.py --data clips.hdf5 --mesh dp=4,tp=2 \
        --remat-policy levels --batch-size 32
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_mesh(spec: str):
    """'dp=4,tp=2' -> Mesh over the first dp*tp devices; '' -> None."""
    if not spec:
        return None
    import jax

    from v2a_tpu.parallel.mesh import make_mesh

    names, sizes = [], []
    for part in spec.split(","):
        name, _, size = part.partition("=")
        names.append(name.strip())
        sizes.append(int(size))
    n = 1
    for s in sizes:
        n *= s
    return make_mesh(tuple(names), tuple(sizes), devices=jax.devices()[:n])


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True,
                   help="HDF5 episode file (data/h5_ingest.py layout)")
    p.add_argument("--tasks", default="",
                   help="comma-separated task keys (default: all in file)")
    p.add_argument("--workdir", default="logs/video")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--n-steps", type=int, default=200_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save-freq", type=int, default=5000)
    p.add_argument("--log-freq", type=int, default=100)
    p.add_argument("--stride", type=int, default=4,
                   help="frame subsampling stride within an episode")
    p.add_argument("--schedule-sampler", default="uniform",
                   choices=["uniform", "loss-second-moment"])
    p.add_argument("--use-checkpoint", action="store_true",
                   help="gradient checkpointing (block-level jax.remat)")
    p.add_argument("--remat-policy", default="blocks",
                   choices=["blocks", "levels"])
    p.add_argument("--mesh", default="",
                   help="e.g. dp=4 or dp=4,tp=2 (default: single device)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest milestone from --workdir")
    p.add_argument("--sample-after", action="store_true",
                   help="sample one validation video per task at the end")
    # model surface (reference factory defaults, lb_video_model_utils.py)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--frames", type=int, default=7,
                   help="future frames per clip (sample_per_seq - 1)")
    p.add_argument("--model-channels", type=int, default=128)
    p.add_argument("--channel-mult", default="1,2,3,4,5")
    p.add_argument("--num-res-blocks", type=int, default=2)
    p.add_argument("--attention-resolutions", default="8,16")
    p.add_argument("--timesteps", type=int, default=100)
    p.add_argument("--text-dim", type=int, default=512)
    p.add_argument("--dtype", default="",
                   help="compute dtype (default: bf16 on TPU, f32 on CPU)")
    p.add_argument("--backbone", default="unet", choices=["unet", "xattn"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import h5py
    import jax
    import numpy as np

    from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel
    from v2a_tpu.train.video_trainer import (
        VideoClipDataset, VideoModelTrainer, VideoTrainerConfig,
    )

    if args.tasks:
        tasks = [t.strip() for t in args.tasks.split(",")]
    else:
        with h5py.File(args.data, "r") as f:
            tasks = list(f.keys())

    dtype = args.dtype or (
        "bfloat16" if jax.devices()[0].platform != "cpu" else "float32"
    )
    vcfg = VideoModelConfig(
        image_size=(args.image_size, args.image_size),
        sample_per_seq=args.frames + 1,
        timesteps=args.timesteps,
        sampling_timesteps=args.timesteps,
        model_channels=args.model_channels,
        channel_mult=tuple(int(m) for m in args.channel_mult.split(",")),
        num_res_blocks=args.num_res_blocks,
        attention_resolutions=tuple(
            int(r) for r in args.attention_resolutions.split(",") if r
        ),
        text_dim=args.text_dim,
        dtype=dtype,
        backbone=args.backbone,
    )
    model = VideoPredModel(vcfg)
    ds = VideoClipDataset(args.data, tasks, frames=args.frames,
                          stride=args.stride)
    tcfg = VideoTrainerConfig(
        lr=args.lr, batch_size=args.batch_size, n_train_steps=args.n_steps,
        save_freq=args.save_freq, log_freq=args.log_freq,
        schedule_sampler=args.schedule_sampler,
        use_checkpoint=args.use_checkpoint, remat_policy=args.remat_policy,
    )
    trainer = VideoModelTrainer(
        model, ds, tcfg, workdir=args.workdir, mesh=parse_mesh(args.mesh),
    )
    if args.resume:
        trainer.load()
        print(f"resumed at step {trainer.step}", flush=True)
    print(json.dumps({
        "tasks": tasks, "clips": len(ds),
        "params": model.param_count(), "dtype": dtype,
        "mesh": args.mesh or None, "workdir": args.workdir,
    }), flush=True)

    trainer.train(args.n_steps)
    trainer.save()

    if args.sample_after:
        out = model.sample(
            jax.random.PRNGKey(0),
            np.zeros((len(tasks), args.image_size, args.image_size, 3),
                     np.float32),
            tasks,
        )
        path = os.path.join(args.workdir, "validation_videos.npy")
        np.save(path, np.asarray(out))
        print(f"wrote {path} {tuple(np.asarray(out).shape)}", flush=True)


if __name__ == "__main__":
    main()
