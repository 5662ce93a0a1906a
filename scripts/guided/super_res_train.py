"""Train a super-resolution diffusion model — guided-diffusion CLI.

Counterpart of `flowdiffusion/guided_diffusion/scripts/super_res_train.py:1-98`:
large/small-size flags, area-downsampled low-res conditioning concatenated
on channels (`v2a_tpu.models.image_unet.superres_condition`).
"""

from __future__ import annotations

import jax.numpy as jnp

from _common import TRAIN_DEFAULTS, init_or_restore, run_train_loop

from v2a_tpu.guided import (
    parser_from_defaults,
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)
from v2a_tpu.guided.image_data import load_data
from v2a_tpu.guided.script_util import args_subset
from v2a_tpu.guided.train_loop import GuidedTrainLoop
from v2a_tpu.models.image_unet import superres_condition
from v2a_tpu.ops.resample import create_named_schedule_sampler


def main(argv=None):
    parser = parser_from_defaults(
        TRAIN_DEFAULTS, sr_model_and_diffusion_defaults())
    args = parser.parse_args(argv)

    model, diffusion = sr_create_model_and_diffusion(
        **args_subset(args, sr_model_and_diffusion_defaults().keys())
    )
    x = jnp.zeros((1, args.large_size, args.large_size, 6))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1,), jnp.int32) if args.class_cond else None
    params = init_or_restore(model, args.resume_checkpoint, x, t, y)

    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.large_size,
        class_cond=args.class_cond,
        low_res=args.small_size,
        seed=args.seed,
    )

    def model_fn(params, x_t, tt, low_res=None, y=None):
        return model.apply(params, superres_condition(x_t, low_res), tt, y)

    loop = GuidedTrainLoop(
        model_fn=model_fn,
        diffusion=diffusion,
        params=params,
        data=data,
        batch_size=args.batch_size,
        microbatch=args.microbatch,
        lr=args.lr,
        ema_rate=args.ema_rate,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        schedule_sampler=create_named_schedule_sampler(
            args.schedule_sampler, diffusion.num_timesteps),
        out_dir=args.out_dir,
        seed=args.seed,
    )
    run_train_loop(loop, args.max_steps)


if __name__ == "__main__":
    main()
