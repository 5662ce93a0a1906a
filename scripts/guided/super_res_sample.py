"""Upsample a batch of low-res images with a super-res diffusion model.

Counterpart of
`flowdiffusion/guided_diffusion/scripts/super_res_sample.py:1-119`:
`--base_samples` is an npz of uint8 NHWC low-res images (optionally with a
label array), the output a uint8 npz at `large_size`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from _common import load_params, save_samples_npz

from v2a_tpu.guided import (
    parser_from_defaults,
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)
from v2a_tpu.guided.script_util import args_subset
from v2a_tpu.models.image_unet import superres_condition

SR_SAMPLE_DEFAULTS = dict(
    clip_denoised=True,
    num_samples=16,
    batch_size=16,
    use_ddim=False,
    base_samples="",
    model_path="",
    out_dir="guided_out",
    seed=0,
)


def main(argv=None):
    parser = parser_from_defaults(
        SR_SAMPLE_DEFAULTS, sr_model_and_diffusion_defaults())
    args = parser.parse_args(argv)

    model, diffusion = sr_create_model_and_diffusion(
        **args_subset(args, sr_model_and_diffusion_defaults().keys())
    )
    x0 = jnp.zeros((1, args.large_size, args.large_size, 6))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1,), jnp.int32) if args.class_cond else None
    params = load_params(args.model_path) if args.model_path else model.init(
        jax.random.PRNGKey(0), x0, t0, y0)

    with np.load(args.base_samples) as obj:
        base = obj["arr_0"].astype(np.float32) / 127.5 - 1.0
        labels = obj["arr_1"] if args.class_cond else None

    shape = (args.batch_size, args.large_size, args.large_size, 3)
    loop = diffusion.ddim_sample_loop if args.use_ddim else diffusion.p_sample_loop

    @jax.jit
    def sample(rng, low_res, y):
        def model_fn(x_t, tt, low_res=None, y=None):
            return model.apply(params, superres_condition(x_t, low_res), tt, y)

        kwargs = {"low_res": low_res}
        if args.class_cond:
            kwargs["y"] = y
        return loop(
            model_fn, rng, shape,
            clip_denoised=args.clip_denoised, model_kwargs=kwargs,
        )

    rng = jax.random.PRNGKey(args.seed)
    out, done = [], 0
    n = min(args.num_samples, len(base))
    while done < n:
        lo = base[done:done + args.batch_size]
        y = labels[done:done + args.batch_size] if labels is not None else None
        if len(lo) < args.batch_size:  # static shapes: pad the tail batch
            pad = args.batch_size - len(lo)
            lo = np.concatenate([lo, lo[-1:].repeat(pad, 0)])
            if y is not None:
                y = np.concatenate([y, y[-1:].repeat(pad, 0)])
        rng, sub = jax.random.split(rng)
        img = np.asarray(sample(
            sub, jnp.asarray(lo),
            jnp.asarray(y) if y is not None else jnp.zeros(
                (args.batch_size,), jnp.int32),
        ))
        out.append(img[: n - done])
        done += len(out[-1])
        print(f"upsampled {done}", flush=True)

    save_samples_npz(args.out_dir, np.concatenate(out),
                     labels[:n] if labels is not None else None)


if __name__ == "__main__":
    main()
