"""Generic guided-diffusion train loop (image / super-res / classifier).

Counterpart of the reference `guided_diffusion/train_util.py:31-236`
(`TrainLoop`): Adam(+weight decay) on the diffusion `training_losses`,
comma-list EMA rates, microbatch gradient accumulation, loss-aware
timestep resampling, periodic checkpointing, lr annealing. TPU-first:
the whole step (micro-batch scan + grads + Adam + every EMA rate) is ONE
jitted program with donated state; fp16 loss-scaling has no TPU
counterpart (bf16 needs none).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from v2a_tpu.ops.guided_diffusion_core import GuidedDiffusion
from v2a_tpu.ops.resample import UniformSampler


@dataclasses.dataclass
class GuidedTrainLoop:
    """`train_util.py:31-116`. `model_fn(params, x_t, t, **kwargs)` must
    return the model output (2C channels when learn_sigma)."""

    model_fn: Callable[..., jax.Array]
    diffusion: GuidedDiffusion
    params: Any
    data: Iterator
    batch_size: int
    microbatch: int = -1
    lr: float = 1e-4
    ema_rate: str = "0.9999"
    log_interval: int = 10
    save_interval: int = 10_000
    weight_decay: float = 0.0
    lr_anneal_steps: int = 0
    schedule_sampler: Any = None
    out_dir: str = "."
    seed: int = 0

    def __post_init__(self):
        self.ema_rates = tuple(
            float(r) for r in str(self.ema_rate).split(",") if r
        )
        self.sampler = self.schedule_sampler or UniformSampler(
            self.diffusion.num_timesteps
        )
        self.step = 0
        self._np_rng = np.random.default_rng(self.seed)
        self._rng = jax.random.PRNGKey(self.seed)
        if self.weight_decay:
            self.tx = optax.adamw(self._lr_schedule, weight_decay=self.weight_decay)
        else:
            self.tx = optax.adam(self._lr_schedule)
        self.opt_state = self.tx.init(self.params)
        self.ema_params = [
            jax.tree_util.tree_map(jnp.copy, self.params)
            for _ in self.ema_rates
        ]
        self._jit_step = jax.jit(self._step, donate_argnums=(0, 1, 2))

    def _lr_schedule(self, step):
        """`train_util.py:287-293` linear anneal to zero."""
        if not self.lr_anneal_steps:
            return self.lr
        frac = jnp.minimum(step / self.lr_anneal_steps, 1.0)
        return self.lr * (1.0 - frac)

    # -- the one compiled program ---------------------------------------

    def _losses(self, params, rng, x, t, weights, kwargs):
        def model(x_t, tt, **kw):
            return self.model_fn(params, x_t, tt, **kw)

        terms = self.diffusion.training_losses(
            model, rng, x, t, model_kwargs=kwargs
        )
        loss = jnp.mean(terms["loss"] * weights)
        return loss, terms["loss"]

    def _step(self, params, opt_state, ema_params, rng, x, t, weights, kwargs):
        micro = self.microbatch if self.microbatch > 0 else x.shape[0]
        n_micro = x.shape[0] // micro

        def one(p, rng, xs, ts, ws, kws):
            (loss, per), grads = jax.value_and_grad(
                self._losses, has_aux=True
            )(p, rng, xs, ts, ws, kws)
            return loss, per, grads

        if n_micro <= 1:
            loss, per_sample, grads = one(params, rng, x, t, weights, kwargs)
        else:
            def body(carry, inputs):
                acc, = carry
                rng_i, xs, ts, ws, kws = inputs
                loss_i, per_i, g_i = one(params, rng_i, xs, ts, ws, kws)
                acc = jax.tree_util.tree_map(jnp.add, acc, g_i)
                return (acc,), (loss_i, per_i)

            split = lambda a: a.reshape((n_micro, micro) + a.shape[1:])
            rngs = jax.random.split(rng, n_micro)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (acc,), (losses, per_sample) = jax.lax.scan(
                body, (zeros,),
                (rngs, split(x), split(t), split(weights),
                 jax.tree_util.tree_map(split, kwargs)),
            )
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, acc)
            loss = jnp.mean(losses)
            per_sample = per_sample.reshape(-1)

        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = [
            jax.tree_util.tree_map(
                lambda e, p: e * rate + p * (1.0 - rate), ema, params
            )
            for rate, ema in zip(self.ema_rates, ema_params)
        ]
        return params, opt_state, ema_params, loss, per_sample

    # -- driver ----------------------------------------------------------

    def run_step(self, x: np.ndarray, kwargs: Dict[str, np.ndarray]) -> float:
        t, weights = self.sampler.sample(x.shape[0], self._np_rng)
        self._rng, step_rng = jax.random.split(self._rng)
        (self.params, self.opt_state, self.ema_params, loss, per_sample
         ) = self._jit_step(
            self.params, self.opt_state, self.ema_params, step_rng,
            jnp.asarray(x, jnp.float32), jnp.asarray(t),
            jnp.asarray(weights), {k: jnp.asarray(v) for k, v in kwargs.items()},
        )
        self.sampler.update_with_losses(t, np.asarray(per_sample))
        self.step += 1
        return float(loss)

    def run_loop(self, max_steps: Optional[int] = None):
        """`train_util.py:118-145`."""
        while (
            (max_steps is None or self.step < max_steps)
            and (not self.lr_anneal_steps or self.step < self.lr_anneal_steps)
        ):
            x, kwargs = next(self.data)
            loss = self.run_step(x, kwargs)
            if self.step % self.log_interval == 0:
                print(f"step {self.step}  loss {loss:.4f}", flush=True)
            if self.save_interval and self.step % self.save_interval == 0:
                self.save()
        self.save()

    def save(self):
        """Model + EMA snapshots as pickled pytrees
        (`train_util.py:230-251`)."""
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"model{self.step:06d}.pkl")
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.params), f)
        for rate, ema in zip(self.ema_rates, self.ema_params):
            ema_path = os.path.join(
                self.out_dir, f"ema_{rate}_{self.step:06d}.pkl")
            with open(ema_path, "wb") as f:
                pickle.dump(jax.device_get(ema), f)
        return path


def classifier_loss_fn(
    apply_fn: Callable[..., jax.Array],
    diffusion: GuidedDiffusion,
) -> Callable:
    """Noisy-classifier objective (`scripts/classifier_train.py:87-137`):
    cross-entropy of the classifier on q_sample-noised images at uniform
    timesteps."""

    def loss(params, rng, x, y, t):
        noise_rng, = jax.random.split(rng, 1)
        noise = jax.random.normal(noise_rng, x.shape, jnp.float32)
        x_t = diffusion.q_sample(x, t, noise)
        logits = apply_fn(params, x_t, t)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return jnp.mean(nll), acc

    return loss
