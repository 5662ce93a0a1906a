"""Train an image diffusion model — guided-diffusion CLI surface.

Counterpart of `flowdiffusion/guided_diffusion/scripts/image_train.py:1-83`
with the same flag names; runs this repo's jitted `GuidedTrainLoop`.
"""

from __future__ import annotations

from _common import (  # noqa: E402  (sys.path bootstrap lives there)
    TRAIN_DEFAULTS,
    init_or_restore,
    run_train_loop,
)

from v2a_tpu.guided import (
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    parser_from_defaults,
)
from v2a_tpu.guided.image_data import load_data
from v2a_tpu.guided.script_util import args_subset
from v2a_tpu.guided.train_loop import GuidedTrainLoop
from v2a_tpu.ops.resample import create_named_schedule_sampler


def main(argv=None):
    parser = parser_from_defaults(TRAIN_DEFAULTS, model_and_diffusion_defaults())
    args = parser.parse_args(argv)

    model, diffusion = create_model_and_diffusion(
        **args_subset(args, model_and_diffusion_defaults().keys())
    )
    x, t = _example(args)
    y = _example_y(args)
    params = init_or_restore(model, args.resume_checkpoint, x, t, y)

    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.image_size,
        class_cond=args.class_cond,
        seed=args.seed,
    )

    def model_fn(params, x_t, tt, y=None):
        return model.apply(params, x_t, tt, y)

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


def _example(args):
    from _common import example_image_args

    return example_image_args(args.image_size)


def _example_y(args):
    import jax.numpy as jnp

    return jnp.zeros((1,), jnp.int32) if args.class_cond else None


if __name__ == "__main__":
    main()
