"""Classifier-guided sampling.

Counterpart of
`flowdiffusion/guided_diffusion/scripts/classifier_sample.py:1-131`:
`cond_fn = classifier_scale * grad_x log p(y | x_t, t)` steered through
`GuidedDiffusion.condition_mean/score` (`ops/guided_diffusion_core.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from _common import example_image_args, load_params, save_samples_npz

from v2a_tpu.guided import (
    NUM_CLASSES,
    classifier_and_diffusion_defaults,
    create_classifier_and_diffusion,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    parser_from_defaults,
)
from v2a_tpu.guided.script_util import args_subset

GUIDED_DEFAULTS = dict(
    clip_denoised=True,
    num_samples=16,
    batch_size=16,
    use_ddim=False,
    model_path="",
    classifier_path="",
    classifier_scale=1.0,
    out_dir="guided_out",
    seed=0,
)


def main(argv=None):
    parser = parser_from_defaults(
        GUIDED_DEFAULTS, model_and_diffusion_defaults(),
        classifier_and_diffusion_defaults())
    args = parser.parse_args(argv)
    # the diffusion model here is class-conditional (`classifier_sample.py:27`)
    args.class_cond = True

    model, diffusion = create_model_and_diffusion(
        **args_subset(args, model_and_diffusion_defaults().keys())
    )
    classifier, _ = create_classifier_and_diffusion(
        **args_subset(args, classifier_and_diffusion_defaults().keys())
    )

    x0, t0 = example_image_args(args.image_size)
    params = load_params(args.model_path) if args.model_path else model.init(
        jax.random.PRNGKey(0), x0, t0, jnp.zeros((1,), jnp.int32))
    cls_params = (
        load_params(args.classifier_path) if args.classifier_path
        else classifier.init(jax.random.PRNGKey(1), x0, t0)
    )

    shape = (args.batch_size, args.image_size, args.image_size, 3)
    loop = diffusion.ddim_sample_loop if args.use_ddim else diffusion.p_sample_loop

    def cond_fn(x, t, y=None):
        """`classifier_sample.py:55-62`: grad of selected log-prob."""

        def logp(x):
            logits = classifier.apply(cls_params, x, t)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.sum(
                jnp.take_along_axis(lp, y[:, None], axis=-1))

        return jax.grad(logp)(x) * args.classifier_scale

    @jax.jit
    def sample(rng, y):
        def model_fn(x_t, tt, y=None):
            return model.apply(params, x_t, tt, y)

        return loop(
            model_fn, rng, shape, clip_denoised=args.clip_denoised,
            cond_fn=cond_fn, model_kwargs={"y": y},
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
    save_samples_npz(args.out_dir, images, labels)


if __name__ == "__main__":
    main()
