"""Train a noisy classifier for guided sampling.

Counterpart of
`flowdiffusion/guided_diffusion/scripts/classifier_train.py:1-226`:
cross-entropy on q_sample-noised images (`--noised`), AdamW, EMA-free (the
reference keeps none either), pickled snapshots.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from _common import TRAIN_DEFAULTS

from v2a_tpu.guided import (
    classifier_and_diffusion_defaults,
    create_classifier_and_diffusion,
    parser_from_defaults,
)
from v2a_tpu.guided.image_data import load_data
from v2a_tpu.guided.script_util import args_subset
from v2a_tpu.guided.train_loop import classifier_loss_fn
from v2a_tpu.ops.resample import create_named_schedule_sampler

CLS_DEFAULTS = dict(TRAIN_DEFAULTS, noised=True, anneal_lr=False,
                    weight_decay=0.05, lr=3e-4)


def main(argv=None):
    parser = parser_from_defaults(
        CLS_DEFAULTS, classifier_and_diffusion_defaults())
    args = parser.parse_args(argv)

    classifier, diffusion = create_classifier_and_diffusion(
        **args_subset(args, classifier_and_diffusion_defaults().keys())
    )
    x0 = jnp.zeros((1, args.image_size, args.image_size, 3))
    t0 = jnp.zeros((1,), jnp.int32)
    if args.resume_checkpoint:
        with open(args.resume_checkpoint, "rb") as f:
            params = pickle.load(f)
    else:
        params = classifier.init(jax.random.PRNGKey(0), x0, t0)

    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.image_size,
        class_cond=True,
        seed=args.seed,
    )

    loss_fn = classifier_loss_fn(classifier.apply, diffusion)
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)
    sampler = create_named_schedule_sampler(
        args.schedule_sampler, diffusion.num_timesteps)

    @jax.jit
    def step(params, opt_state, rng, x, y, t):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rng, x, y, t)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    rng = jax.random.PRNGKey(args.seed)
    np_rng = np.random.default_rng(args.seed)
    i = 0
    while not args.max_steps or i < args.max_steps:
        x, kwargs = next(data)
        if args.noised:
            t, _ = sampler.sample(x.shape[0], np_rng)
        else:
            t = np.zeros(x.shape[0], np.int32)
        rng, sub = jax.random.split(rng)
        params, opt_state, loss, acc = step(
            params, opt_state, sub, jnp.asarray(x),
            jnp.asarray(kwargs["y"]), jnp.asarray(t),
        )
        i += 1
        if i % args.log_interval == 0:
            print(f"step {i}  loss {float(loss):.4f}  acc {float(acc):.3f}",
                  flush=True)
        if args.save_interval and i % args.save_interval == 0:
            _save(args.out_dir, params, i)
    _save(args.out_dir, params, i)


def _save(out_dir, params, step):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"classifier{step:06d}.pkl")
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
