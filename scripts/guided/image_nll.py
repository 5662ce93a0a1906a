"""Bits/dimension evaluation of an image diffusion model.

Counterpart of `flowdiffusion/guided_diffusion/scripts/image_nll.py:1-96`:
full-VLB sweep (`calc_bpd_loop`) over a deterministic data pass, saving the
per-term npz breakdowns.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_image_args, load_params

from v2a_tpu.guided import (
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    parser_from_defaults,
)
from v2a_tpu.guided.image_data import load_data
from v2a_tpu.guided.script_util import args_subset

NLL_DEFAULTS = dict(
    data_dir="",
    clip_denoised=True,
    num_samples=1000,
    batch_size=1,
    model_path="",
    out_dir="guided_out",
    seed=0,
)


def main(argv=None):
    parser = parser_from_defaults(NLL_DEFAULTS, model_and_diffusion_defaults())
    args = parser.parse_args(argv)

    model, diffusion = create_model_and_diffusion(
        **args_subset(args, model_and_diffusion_defaults().keys())
    )
    params = load_params(args.model_path) if args.model_path else model.init(
        jax.random.PRNGKey(0), *example_image_args(args.image_size),
        jnp.zeros((1,), jnp.int32) if args.class_cond else None,
    )

    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.image_size,
        class_cond=args.class_cond,
        deterministic=True,
        seed=args.seed,
    )

    @jax.jit
    def bpd(rng, x, y):
        def model_fn(x_t, tt, y=None):
            return model.apply(params, x_t, tt, y)

        kwargs = {"y": y} if args.class_cond else None
        return diffusion.calc_bpd_loop(
            model_fn, rng, x, clip_denoised=args.clip_denoised,
            model_kwargs=kwargs,
        )

    rng = jax.random.PRNGKey(args.seed)
    all_bpd, terms = [], {"vb": [], "mse": [], "xstart_mse": []}
    done = 0
    while done < args.num_samples:
        x, kwargs = next(data)
        rng, sub = jax.random.split(rng)
        out = bpd(sub, jnp.asarray(x), kwargs.get("y"))
        for key in terms:
            terms[key].append(np.asarray(out[key]).mean(axis=0))
        all_bpd.append(float(out["total_bpd"].mean()))
        done += x.shape[0]
        print(f"done {done} samples: bpd={np.mean(all_bpd):.4f}", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    for key, vals in terms.items():
        path = os.path.join(args.out_dir, f"{key}_terms.npz")
        np.savez(path, np.mean(np.stack(vals), axis=0))
        print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
