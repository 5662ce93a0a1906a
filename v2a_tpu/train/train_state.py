"""Train state and the jitted policy train step.

The reference's optimization recipe (`config/libero/lb_tk8_65to72.py:
138-152`, `lb_online_trainer_v7.py:130-137,592-624`): AdamW(lr 1e-4, betas
(0.95, 0.999), eps 1e-8, wd 1e-6), grad-clip 1.0, and an `ema_pytorch.EMA`
of the policy with warmup decay `1 - (1 + step/inv_gamma)^(-power)` capped
at `beta`. On TPU this becomes one donated jitted function: loss + grads +
AdamW update + EMA update fused into a single XLA program, bf16-safe
(no GradScaler — the reference's fp16 loss-scaling machinery has no bf16
counterpart and is deliberately dropped).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors `opt_params` + grad clip of the release config."""

    lr: float = 1e-4
    b1: float = 0.95
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 1e-6
    grad_clip: float = 1.0


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    """Mirrors `ema_params` (`config/libero/lb_tk8_65to72.py:146-152`) and
    ema_pytorch's warmup schedule."""

    update_after_step: int = 0
    inv_gamma: float = 1.0
    power: float = 0.75
    min_value: float = 0.0
    beta: float = 0.9999
    update_every: int = 1


def ema_decay(step: jax.Array, cfg: EMAConfig) -> jax.Array:
    """ema_pytorch warmup decay: 0 until `update_after_step`, then
    `1 - (1 + s/inv_gamma)^(-power)` clipped to [min_value, beta]."""
    s = jnp.maximum(step - cfg.update_after_step - 1, 0).astype(jnp.float32)
    value = 1.0 - (1.0 + s / cfg.inv_gamma) ** (-cfg.power)
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(step <= cfg.update_after_step, 0.0, value)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            cfg.lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )


class StepOutput(NamedTuple):
    state: Any
    loss: jax.Array
    grad_norm: jax.Array


def make_train_step(
    loss_fn: Callable[[Any, jax.Array, Any], jax.Array],
    tx: optax.GradientTransformation,
    ema_cfg: Optional[EMAConfig] = None,
    accumulate: int = 1,
) -> Callable[[TrainState, jax.Array, Any], StepOutput]:
    """Build the fused train step. `loss_fn(params, rng, batch) -> scalar`.

    With `accumulate > 1` (the reference's `gradient_accumulate_every` loop,
    `lb_online_trainer_v7.py:496-604`), every batch leaf must carry a
    leading `(accumulate, ...)` axis of independent micro-batches; gradients
    are averaged over a `lax.scan` before ONE optimizer/EMA update.

    The returned function is pure and jit-friendly; jit it with
    `donate_argnums=(0,)` so parameter/optimizer buffers are reused in-place
    in HBM.
    """
    ema_cfg = ema_cfg or EMAConfig()

    def train_step(state: TrainState, rng: jax.Array, batch: Any) -> StepOutput:
        if accumulate == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, rng, batch)
        else:
            def micro(carry, inputs):
                sub_rng, micro_batch = inputs
                l, g = jax.value_and_grad(loss_fn)(
                    state.params, sub_rng, micro_batch
                )
                acc_l, acc_g = carry
                return (
                    acc_l + l / accumulate,
                    jax.tree_util.tree_map(
                        lambda a, b: a + b / accumulate, acc_g, g
                    ),
                ), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, accumulate)
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros(()), zeros), (rngs, batch)
            )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        step = state.step + 1
        decay = ema_decay(step, ema_cfg)
        # honor update_every (ema_pytorch skips updates between multiples)
        do_update = (step % ema_cfg.update_every == 0).astype(jnp.float32)
        decay = 1.0 - (1.0 - decay) * do_update
        ema_params = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema_params, params
        )
        new_state = state.replace(
            step=step, params=params, opt_state=opt_state, ema_params=ema_params
        )
        return StepOutput(new_state, loss, grad_norm)

    return train_step
