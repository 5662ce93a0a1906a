"""Sample from a trained image diffusion model — guided-diffusion CLI.

Counterpart of `flowdiffusion/guided_diffusion/scripts/image_sample.py:1-108`:
batched (DDPM or DDIM via `--use_ddim` / `timestep_respacing=ddimN`)
sampling to a uint8 npz the evaluator CLI consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_image_args, load_params, save_samples_npz

from v2a_tpu.guided import (
    NUM_CLASSES,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    parser_from_defaults,
)
from v2a_tpu.guided.script_util import args_subset

SAMPLE_DEFAULTS = dict(
    clip_denoised=True,
    num_samples=16,
    batch_size=16,
    use_ddim=False,
    model_path="",
    out_dir="guided_out",
    seed=0,
)


def main(argv=None):
    parser = parser_from_defaults(SAMPLE_DEFAULTS, model_and_diffusion_defaults())
    args = parser.parse_args(argv)

    model, diffusion = create_model_and_diffusion(
        **args_subset(args, model_and_diffusion_defaults().keys())
    )
    params = load_params(args.model_path) if args.model_path else model.init(
        jax.random.PRNGKey(0), *example_image_args(args.image_size),
        jnp.zeros((1,), jnp.int32) if args.class_cond else None,
    )

    shape = (args.batch_size, args.image_size, args.image_size, 3)
    loop = diffusion.ddim_sample_loop if args.use_ddim else diffusion.p_sample_loop

    @jax.jit
    def sample(rng, y):
        def model_fn(x_t, tt, y=None):
            return model.apply(params, x_t, tt, y)

        kwargs = {"y": y} if args.class_cond else None
        return loop(
            model_fn, rng, shape,
            clip_denoised=args.clip_denoised, model_kwargs=kwargs,
        )

    rng = jax.random.PRNGKey(args.seed)
    images, labels = [], []
    while sum(x.shape[0] for x in images) < args.num_samples:
        rng, y_rng, s_rng = jax.random.split(rng, 3)
        y = jax.random.randint(y_rng, (args.batch_size,), 0, NUM_CLASSES)
        images.append(np.asarray(sample(s_rng, y)))
        labels.append(np.asarray(y))
        print(f"sampled {sum(x.shape[0] for x in images)}", flush=True)

    images = np.concatenate(images)[: args.num_samples]
    labels = np.concatenate(labels)[: args.num_samples]
    save_samples_npz(
        args.out_dir, images, labels if args.class_cond else None)


if __name__ == "__main__":
    main()
