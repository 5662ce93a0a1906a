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


def measure_chained_steps_per_s():
    """The policy-train north-star measurement (BASELINE.json metric 2):
    scan-chained release-config train steps at batch 64, one dispatch +
    readback per chain (the honest device-throughput protocol, PERF.md).
    Returns the result dict; also called by bench.py so BENCH_r*.json
    regression-tracks this metric every round (VERDICT round-4 weak #3)."""
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        cfg = PolicyConfig(dtype="bfloat16")
        batch = 64
        n_iters = 60
    else:
        cfg = PolicyConfig(
            image_size=(32, 32), down_dims=(32, 64), horizon=8,
            n_action_steps=4, num_train_timesteps=10,
        )
        batch = 8
        n_iters = 3

    policy = DiffusionPolicy.create(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    loss_fn = policy.loss
    if os.environ.get("V2A_PACK_SMALL", "0") == "1":
        # experiment: pack the 208 tiny leaves into one vector so the
        # optimizer/norm/prefetch passes over them are single fused ops
        from v2a_tpu.train.train_state import SmallLeafPacker

        packer = SmallLeafPacker(params)
        inner = loss_fn
        loss_fn = lambda pt, rng, b: inner(packer.unpack(pt), rng, b)  # noqa: E731
        params = packer.pack(params)
    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(params, tx)
    train_step = make_train_step(loss_fn, tx, EMAConfig())
    step = jax.jit(train_step, donate_argnums=(0,))

    # Scan-chained variant: n_iters sequential steps inside ONE compiled
    # program, the way bench.py chains DDIM steps. The Python loop below
    # pays a ~24 ms axon-tunnel dispatch PER STEP on top of the ~12 ms
    # device step (round-3 capture: loop said 27.6 steps/s on a day the
    # trace said 12.1 ms device), so the loop number measures the tunnel,
    # not the chip. One dispatch + one readback per chain is the honest
    # device-throughput number; a real trainer's dispatch overlaps with
    # host-side batch sampling (see the prefetch loop metric).
    def chained(st, rng_key, batch_const):
        def body(carry, i):
            out = train_step(carry, jax.random.fold_in(rng_key, i), batch_const)
            return out.state, out.loss
        st, losses = jax.lax.scan(body, st, jnp.arange(n_iters))
        return st, losses[-1]

    chain = jax.jit(chained, donate_argnums=(0,))

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
    state, loss = chain(state, rng, batch_data)
    np.asarray(loss)  # compile + readback

    n_chains = 5 if on_tpu else 2
    chain_s = []
    for k in range(n_chains):
        t0 = time.perf_counter()
        state, loss = chain(state, jax.random.fold_in(rng, 777 + k), batch_data)
        np.asarray(loss)  # force completion through the tunnel
        chain_s.append(time.perf_counter() - t0)
    dt = sorted(chain_s)[len(chain_s) // 2] / n_iters

    return {
        "metric": f"policy_train_steps_per_sec_bs{batch}",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s/chip",
        "vs_baseline": None,
        "chain_len": n_iters,
        "chain_s": [round(s, 3) for s in chain_s],
        "_internal": (cfg, batch, n_iters, state, step, rng),
    }


def main():
    result = measure_chained_steps_per_s()
    cfg, batch, n_iters, state, step, rng = result.pop("_internal")
    h, w = cfg.image_size
    rs = np.random.RandomState(0)
    print(json.dumps(result))

    # -- end-to-end loop incl. host buffer sampling: synchronous vs prefetch
    # (the reference samples + `.to(device)` inside the step,
    # `lb_online_trainer_v7.py:558,586`; the prefetcher overlaps both)
    from v2a_tpu.data.replay_buffer import ReplayBuffer
    from v2a_tpu.parallel.prefetch import PrefetchIterator

    buf = ReplayBuffer(64, 200, 20, sample_act_seq_len=cfg.horizon)
    for ep in range(32):
        T = 80
        imgs = rs.randint(0, 255, (T + 1, h, w, 3), dtype=np.uint8)
        acts = rs.uniform(-1, 1, (T, cfg.action_dim)).astype(np.float32)
        buf.add_episode("task", "agent", 0, list(imgs), list(acts))
    np_rng = np.random.default_rng(0)

    def sample_device_batch(rng_local=np_rng):
        hb = buf.sample_batch(batch, rng_local)
        return {
            "obs": {
                "img_obs_1": jnp.asarray(hb["img_obs"]).astype(jnp.float32)
                / 255.0,
                "img_goal_1": jnp.asarray(hb["img_goal"]).astype(jnp.float32)
                / 255.0,
            },
            "action": jnp.asarray(hb["action"]),
        }

    def run_loop(get_batch, n):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, loss, _ = step(
                state, jax.random.fold_in(rng, 1000 + i), get_batch()
            )
        np.asarray(loss)
        return (time.perf_counter() - t0) / n

    # note the policy loss keys differ from cfg.obs_keys ordering only in
    # naming; adapt if needed
    try:
        sync_dt = run_loop(sample_device_batch, max(n_iters, 4))
        pf = PrefetchIterator(sample_device_batch, depth=2)
        try:
            pf_dt = run_loop(lambda: next(pf), max(n_iters, 4))
        finally:
            pf.stop()
        print(json.dumps({
            "metric": "train_loop_steps_per_sec_sync_vs_prefetch",
            "sync": round(1.0 / sync_dt, 3),
            "prefetch": round(1.0 / pf_dt, 3),
            "unit": "steps/s/chip",
            "speedup": round(sync_dt / pf_dt, 3),
        }))
    except Exception as e:  # keep the primary metric robust
        print(json.dumps({"metric": "train_loop_prefetch", "error": str(e)}))


if __name__ == "__main__":
    main()
