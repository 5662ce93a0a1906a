"""Secondary benchmark: policy train steps/s at the release configuration.

Measures the fused jitted train step (loss + grad + AdamW + EMA, donated
buffers) on the real policy shapes: batch 64, two 128x128 rgb obs through
ResNet18+SpatialSoftmax encoders, 100-timestep DDPM epsilon loss over
(64, 16, 7) action windows — the hot loop of `LB_Online_Trainer_V7.train`
(`lb_online_trainer_v7.py:586-624`). Timing forces a scalar readback per
step (see PERF.md).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = null (the reference publishes no train-throughput numbers).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
from v2a_tpu.train.train_state import (
    EMAConfig, OptimizerConfig, TrainState, make_optimizer, make_train_step,
)


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        cfg = PolicyConfig(dtype="bfloat16")
        batch = 64
        n_iters = 20
    else:
        cfg = PolicyConfig(
            image_size=(32, 32), down_dims=(32, 64), horizon=8,
            n_action_steps=4, num_train_timesteps=10,
        )
        batch = 8
        n_iters = 3

    policy = DiffusionPolicy.create(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(params, tx)
    step = jax.jit(
        make_train_step(policy.loss, tx, EMAConfig()), donate_argnums=(0,)
    )

    h, w = cfg.image_size
    rs = np.random.RandomState(0)
    batch_data = {
        "obs": {
            k: jnp.asarray(rs.rand(batch, h, w, 3), jnp.float32)
            for k in cfg.obs_keys
        },
        "action": jnp.asarray(
            rs.uniform(-1, 1, (batch, cfg.horizon, cfg.action_dim)),
            jnp.float32,
        ),
    }

    rng = jax.random.PRNGKey(1)
    state, loss, gnorm = step(state, rng, batch_data)
    np.asarray(loss)  # compile + readback

    t0 = time.perf_counter()
    for i in range(n_iters):
        state, loss, gnorm = step(state, jax.random.fold_in(rng, i), batch_data)
        np.asarray(loss)
    dt = (time.perf_counter() - t0) / n_iters

    print(json.dumps({
        "metric": f"policy_train_steps_per_sec_bs{batch}",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
