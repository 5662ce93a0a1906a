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
import os
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

# Storage dtype for gradients between the backward pass and the optimizer
# update. bf16 storage LOSES on TPU (measured 72.7 vs 76.7 steps/s,
# PERF.md round 3): XLA convolutions are not fusible producers, so the
# backward's weight-grad convs materialize f32 to HBM regardless and the
# bf16 cast becomes an EXTRA 525 MB elementwise pass instead of a saving.
# Kept as an experiment flag (V2A_GRAD_DTYPE=bfloat16); the fused
# optimizer below does all arithmetic in float32 for any storage dtype.
GRAD_DTYPE = jnp.dtype(os.environ.get("V2A_GRAD_DTYPE", "float32"))

# Storage dtype for the Adam moments (m, v). The reference keeps f32
# moments (torch AdamW); bf16 STORAGE with f32 update arithmetic halves
# the optimizer pass's dominant HBM traffic (4 of the 9 per-step
# parameter-sized passes) at the cost of moment quantization — an OPT-IN
# speed knob, never the default (reference semantics stay f32).
MOMENT_DTYPE = jnp.dtype(os.environ.get("V2A_MOMENT_DTYPE", "float32"))

# One-shot bf16 materialization of the large compute weights. By default
# XLA fuses the f32->bf16 cast into every consumer, so the fwd AND bwd
# conv/dense weight prefetches stream the f32 master copies (2x bytes)
# from HBM — the round-3 chained train trace shows 2.8 ms/step of
# copy-done stalls dominated by f32[3,3,C,D] / f32[5,1024,1024] weight
# prefetches. With V2A_WCAST=1 every float32 leaf with ndim >= 2 (the
# conv/dense kernels; 1D biases and norm scales keep f32 compute) is
# cast ONCE per step behind an optimization_barrier so all fwd/bwd
# prefetches move bf16. Numerically identical to the cast-at-use default
# for modules whose compute dtype is already bf16 (the cast composes to
# the same bf16 value); gradients flow through the barrier.
WEIGHT_PRECAST = os.environ.get("V2A_WCAST", "0") == "1"


def _precast_compute_weights(params: Any) -> Any:
    def cast(p):
        if isinstance(p, jax.Array) and p.dtype == jnp.float32 and p.ndim >= 2:
            return p.astype(jnp.bfloat16)
        return p

    return jax.lax.optimization_barrier(
        jax.tree_util.tree_map(cast, params)
    )


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors `opt_params` + grad clip of the release config."""

    lr: float = 1e-4
    b1: float = 0.95
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 1e-6
    grad_clip: float = 1.0
    # Adam moment (m, v) STORAGE dtype; update arithmetic is always f32.
    # "bfloat16" halves the optimizer pass's dominant HBM traffic
    # (+6.5% train steps/s measured, PERF.md round 4) at the cost of
    # moment quantization. None -> V2A_MOMENT_DTYPE env, default float32
    # (the reference's torch-AdamW semantics).
    moment_dtype: Optional[str] = None

    def resolved_moment_dtype(self):
        return jnp.dtype(self.moment_dtype) if self.moment_dtype \
            else MOMENT_DTYPE


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


class SmallLeafPacker:
    """Pack every small float32 leaf of a parameter pytree into ONE flat
    vector (big leaves pass through untouched).

    Why: the release policy's parameter tree has 276 leaves of which 208
    hold only 0.8M of the 87M parameters. In the fused train step each
    tiny leaf costs a separate HBM->VMEM prefetch (the trace's 1+ ms
    f32[64] copy-starts jamming the DMA queue), a separate grad-norm
    reduce fusion, and a separate Adam/EMA read-modify-write — per-op
    fill/drain overhead, not bytes (PERF.md round-4 train-step table).
    Packed, the optimizer sees 69 leaves (one 3.2 MB vector + 68 big
    leaves) and every pass over the smalls is a single fused op.

    The packed representation is itself a pytree `{"packed": f32[N],
    "big": [leaf, ...]}`, so `TrainState`, `fused_clip_adamw`,
    `global_grad_norm`, EMA, and checkpointing all work on it unchanged.
    `unpack` rebuilds the exact original tree from in-jit slices; grads
    taken w.r.t. the packed tree are numerically the grads of the
    original leaves (packing is a bijective reshape)."""

    def __init__(self, template: Any, threshold: int = 1 << 17):
        leaves, self.treedef = jax.tree_util.tree_flatten(template)
        self.n_leaves = len(leaves)
        self.small_idx = []
        self.big_idx = []
        for i, leaf in enumerate(leaves):
            small = (
                leaf.size < threshold and leaf.dtype == jnp.float32
                and leaf.ndim >= 1
            )
            (self.small_idx if small else self.big_idx).append(i)
        self.shapes = [leaves[i].shape for i in self.small_idx]
        sizes = [int(np.prod(sh)) for sh in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
        self.packed_size = int(self.offsets[-1])

    def pack(self, tree: Any) -> Any:
        leaves = self.treedef.flatten_up_to(tree)
        if len(leaves) != self.n_leaves:
            raise ValueError("tree does not match the packer template")
        packed = (
            jnp.concatenate([leaves[i].ravel() for i in self.small_idx])
            if self.small_idx else jnp.zeros((0,), jnp.float32)
        )
        return {"packed": packed, "big": [leaves[i] for i in self.big_idx]}

    def unpack(self, packed_tree: Any) -> Any:
        packed = packed_tree["packed"]
        out: list = [None] * self.n_leaves
        for k, i in enumerate(self.small_idx):
            a, b = int(self.offsets[k]), int(self.offsets[k + 1])
            out[i] = packed[a:b].reshape(self.shapes[k])
        for k, i in enumerate(self.big_idx):
            out[i] = packed_tree["big"][k]
        return self.treedef.unflatten(out)


def global_grad_norm(grads: Any) -> jax.Array:
    """Global L2 norm with float32 accumulation regardless of leaf dtype
    (bf16-stored gradients square-sum in f32, matching what fp32 grads
    would produce to within bf16 rounding of the leaves themselves)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    )


def fused_clip_adamw(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """clip_by_global_norm + AdamW as ONE per-leaf elementwise pass.

    Numerically identical to
    `optax.chain(optax.clip_by_global_norm(c), optax.adamw(...))` (unit-
    tested leaf-for-leaf), but (a) accepts gradients stored in any dtype
    and does all arithmetic in float32, and (b) keeps the whole update a
    single tree_map so XLA emits one fused read-modify-write per parameter
    — the optimizer pass of an 87M-param policy is HBM-bandwidth-bound
    (PERF.md round-3 train-step model), so every avoided re-read matters.
    """

    mdtype = cfg.resolved_moment_dtype()

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=mdtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("fused_clip_adamw requires params")
        norm = global_grad_norm(grads)
        # optax.clip_by_global_norm: scale by c/norm only when norm > c
        clip_scale = cfg.grad_clip / jnp.maximum(norm, cfg.grad_clip)
        count = state.count + 1
        c1 = 1.0 - jnp.asarray(cfg.b1, jnp.float32) ** count
        c2 = 1.0 - jnp.asarray(cfg.b2, jnp.float32) ** count

        def leaf(g, mu, nu, p):
            g = g.astype(jnp.float32) * clip_scale
            mu = cfg.b1 * mu.astype(jnp.float32) + (1.0 - cfg.b1) * g
            nu = cfg.b2 * nu.astype(jnp.float32) + (1.0 - cfg.b2) * jnp.square(g)
            mu_hat = mu / c1
            nu_hat = nu / c2
            upd = mu_hat / (jnp.sqrt(nu_hat) + cfg.eps)
            upd = upd + cfg.weight_decay * p.astype(jnp.float32)
            return (
                (-cfg.lr * upd).astype(p.dtype),
                mu.astype(mdtype),
                nu.astype(mdtype),
            )

        g_flat, treedef = jax.tree_util.tree_flatten(grads)
        mu_flat = treedef.flatten_up_to(state.mu)
        nu_flat = treedef.flatten_up_to(state.nu)
        p_flat = treedef.flatten_up_to(params)
        out = [leaf(*args) for args in zip(g_flat, mu_flat, nu_flat, p_flat)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    return fused_clip_adamw(cfg)


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

    if WEIGHT_PRECAST:
        inner_loss = loss_fn

        def loss_fn(params, rng, batch):  # noqa: F811
            return inner_loss(_precast_compute_weights(params), rng, batch)

    def to_storage(grads):
        return jax.tree_util.tree_map(
            lambda g: g.astype(GRAD_DTYPE), grads
        )

    def train_step(state: TrainState, rng: jax.Array, batch: Any) -> StepOutput:
        if accumulate == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, rng, batch)
            grads = to_storage(grads)
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
            grads = to_storage(grads)
        grad_norm = global_grad_norm(grads)
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
