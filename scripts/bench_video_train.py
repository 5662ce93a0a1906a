"""Video U-Net TRAINING step: the gradient-checkpointing tradeoff.

Measures the full diffusion train step (pred_v p_losses fwd+bwd +
fused clip+AdamW + EMA, donated buffers) on the release-size video U-Net
(128ch, mult 1-2-3-4-5, attn 8/16, 7 frames, 128x128, bf16 compute) with
`use_checkpoint` (block-level jax.remat, the reference's
`.../guided_diffusion/nn.py:192-236`) OFF vs ON across batch sizes.

remat is the memory lever that decides which batches FIT in 16 GB HBM at
all; where both fit, it trades ~one extra forward of FLOPs for the saved
activation storage. Chained-scan timing with one readback per chain
(PERF.md: per-step readbacks measure the tunnel, not the chip).

Prints one JSON line per (use_checkpoint, batch) config; "oom": true for
configs the chip cannot hold.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.models.video_unet import VideoUNet
from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
from v2a_tpu.ops.schedules import DiffusionSchedule
from v2a_tpu.train.train_state import (
    EMAConfig, OptimizerConfig, TrainState, make_optimizer, make_train_step,
)

FRAMES, TOKENS = 7, 16


def parse_policy(policy: str):
    """(train_fused, use_ckpt, remat_arg) from a policy string.

    "off" | "blocks" | "levels" | "mxu" — plain-XLA step, that remat
    policy (use_ckpt off for "off"); "tfused[-<remat>]" — differentiable
    Pallas conv routing (VideoUNet.train_fused -> ops/conv_vjp.py),
    optionally combined with a remat policy, e.g. "tfused-blocks".
    """
    train_fused = policy.startswith("tfused")
    remat = policy.split("-", 1)[1] if "-" in policy else (
        "off" if (train_fused or policy == "off") else policy)
    return train_fused, remat != "off", remat


def build_step(use_checkpoint: bool, batch: int, hw: int, mc: int, chain: int,
               remat_policy: str = "blocks", train_fused: bool = False):
    full = mc >= 128
    unet = VideoUNet(
        in_channels=6, model_channels=mc, out_channels=3,
        num_res_blocks=2 if full else 1,
        attention_resolutions=(8, 16) if full else (),
        channel_mult=(1, 2, 3, 4, 5) if full else (1, 2),
        num_head_channels=32,
        task_token_dim=512, dtype=jnp.bfloat16 if full else jnp.float32,
        fused=False, use_checkpoint=use_checkpoint,
        remat_policy=remat_policy, train_fused=train_fused,
    )
    apply_fn = lambda p, x, tt, e: unet.apply(p, x, tt, e)  # noqa: E731
    if use_checkpoint and remat_policy == "levels":
        # mirror VideoModelTrainer: save ONLY the level-transition tags;
        # each level (incl. its skip activations) recomputes in backward
        apply_fn = jax.checkpoint(
            apply_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "v2a_level"),
        )
    elif use_checkpoint and remat_policy == "mxu":
        # surgical policy (round-5 trace finding: the B=4 step stores f32
        # GroupNorm/SiLU intermediates whose HBM round-trips + layout
        # copies eat ~16% of the step): save ONLY MXU outputs (convs +
        # dots); all VPU chains (GroupNorm, SiLU, softmax) recompute in
        # backward from those. The module itself stays plain — no block
        # remat, no level tags.
        apply_fn = jax.checkpoint(
            apply_fn,
            policy=lambda prim, *_, **__: prim.name in (
                "conv_general_dilated", "dot_general"),
        )
    diffusion = GaussianDiffusion(
        schedule=DiffusionSchedule.create(100, "cosine"), objective="pred_v",
    )

    x_probe = jnp.zeros((1, FRAMES, hw, hw, 6))
    shapes = jax.eval_shape(
        lambda r: unet.init(r, x_probe, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, TOKENS, 512))),
        jax.random.PRNGKey(0),
    )
    rngs = iter(jax.random.split(jax.random.PRNGKey(0), 10_000))
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(next(rngs), s.shape, s.dtype) * 0.02,
        shapes,
    )

    def loss_fn(p, rng, batch_data):
        video, x_cond, task_embed, t = batch_data
        return diffusion.p_losses(
            lambda x, tt, e: apply_fn(p, x, tt, e),
            rng, video, x_cond, task_embed, t=t,
        )

    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(params, tx)
    train_step = make_train_step(loss_fn, tx, EMAConfig())

    def chained(st, rng_key, batch_const):
        def body(carry, i):
            out = train_step(carry, jax.random.fold_in(rng_key, i),
                             batch_const)
            return out.state, out.loss
        st, losses = jax.lax.scan(body, st, jnp.arange(chain))
        return st, losses[-1]

    rs = np.random.RandomState(0)
    batch_data = (
        jnp.asarray(rs.rand(batch, FRAMES, hw, hw, 3), jnp.float32),
        jnp.asarray(rs.rand(batch, 1, hw, hw, 3) * 2 - 1, jnp.float32),
        jnp.asarray(rs.randn(batch, TOKENS, 512) * 0.1, jnp.float32),
        jnp.asarray(rs.randint(0, 100, (batch,)), jnp.int32),
    )
    return jax.jit(chained, donate_argnums=(0,)), state, batch_data


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    hw, mc, chain = (128, 128, 6) if on_tpu else (32, 32, 2)
    batches = [int(b) for b in
               os.environ.get("V2A_VTRAIN_BATCHES", "4,8,16").split(",")]
    policies = os.environ.get(
        "V2A_VTRAIN_POLICIES", "off,blocks,levels").split(",")
    configs = [(pol, b) for pol in policies for b in batches]
    if not on_tpu:
        configs = [("off", 2), ("blocks", 2), ("levels", 2)]

    for policy, batch in configs:
        train_fused, use_ckpt, remat = parse_policy(policy)
        label = {"metric": "video_train_steps_per_sec",
                 "use_checkpoint": use_ckpt, "remat_policy": policy,
                 "batch": batch, "unit": "steps/s/chip"}
        try:
            chainf, state, batch_data = build_step(
                use_ckpt, batch, hw, mc, chain,
                remat_policy=remat if use_ckpt else "blocks",
                train_fused=train_fused)
            rng = jax.random.PRNGKey(1)
            state, loss = chainf(state, rng, batch_data)
            np.asarray(loss)  # compile + warm
            times = []
            for k in range(3 if on_tpu else 1):
                t0 = time.perf_counter()
                state, loss = chainf(
                    state, jax.random.fold_in(rng, 99 + k), batch_data)
                np.asarray(loss)
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[len(times) // 2] / chain
            label.update({
                "value": round(1.0 / dt, 3), "step_ms": round(dt * 1e3, 1),
                "frames_per_sec": round(batch * FRAMES / dt, 1),
                "chain_s": [round(s, 3) for s in times],
            })
        except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
            msg = str(e)
            label.update({
                "value": None,
                "oom": "RESOURCE_EXHAUSTED" in msg or "emory" in msg,
                "error": msg[:160],
            })
        print(json.dumps(label), flush=True)


if __name__ == "__main__":
    main()
