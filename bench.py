"""Headline benchmark: video frames/sec/chip for the DDIM video sampler.

Measures the compute-dominant path of the pipeline — the 100-step DDIM chain
of the 3D video diffusion U-Net at the real Libero configuration (128 base
channels, mult 1-2-3-4-5, attention at ds 8/16, 7 future frames, 128x128;
reference `diffuser/libero/lb_video_model_utils.py:41-52`) — batched over the
8 exploration tasks as `OnlineTrainer.video_guided_explore` issues it.

The reference samples these videos one at a time (batch 1) on an A100 under
fp16 autocast (`diffuser/libero/lb_online_trainer_v7.py:871-891`). The repo
publishes no throughput numbers (BASELINE.md), so `vs_baseline` is computed
against an ESTIMATED A100 reference of 4.7 frames/s (one 7-frame video per
~1.5 s at batch 1, 100 steps) — the BASELINE.json north star is >=5x this.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.models.video_unet import VideoUNet
from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
from v2a_tpu.ops.schedules import DiffusionSchedule

A100_REFERENCE_FRAMES_PER_S = 4.7  # estimate; see module docstring

# Physics anchor (PERF.md round-3/4): 16.0 TFLOP per batch-8 DDIM-100
# forward chain at the measured 186 TF/s chip peak bounds the headline at
# ~6.5 frames/s; unlike the A100 estimate this is measured on THIS chip.
FLOP_MODEL_CEILING_FPS = 6.5

BATCH = 8          # the 8 Libero exploration tasks, one video each
FRAMES = 7         # video_future_horizon (video_model.py:34)
H = W = 128
STEPS = 100        # sampling_timesteps (config/libero/lb_tk8_65to72.py:43)
TOKENS = 16        # typical CLIP task-string length


def main():
    import os

    on_tpu = jax.devices()[0].platform != "cpu"
    # CPU smoke: tiny model + 2 steps, still the full code path
    steps = STEPS if on_tpu else 2
    batch = int(os.environ.get("V2A_BENCH_BATCH", BATCH if on_tpu else 1))
    mc = 128 if on_tpu else 32
    hw = H if on_tpu else 32
    use_pallas_gn = os.environ.get("V2A_PALLAS_GN", "0") == "1"
    # Pallas ResBlock-interior fusion (in-layout temporal conv + stats
    # forwarding); default on for TPU, V2A_FUSED=0 reverts
    fused = os.environ.get("V2A_FUSED", "1" if on_tpu else "0") == "1"

    unet = VideoUNet(
        in_channels=6, model_channels=mc, out_channels=3, num_res_blocks=2,
        attention_resolutions=(8, 16), channel_mult=(1, 2, 3, 4, 5),
        num_head_channels=32, task_token_dim=512,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas_gn=use_pallas_gn, fused=fused,
    )
    x_probe = jnp.zeros((1, FRAMES, hw, hw, 6))
    shapes = jax.eval_shape(
        lambda r: unet.init(
            r, x_probe, jnp.zeros((1,), jnp.int32), jnp.zeros((1, TOKENS, 512))
        ),
        jax.random.PRNGKey(0),
    )
    rngs = iter(jax.random.split(jax.random.PRNGKey(0), 10_000))
    params = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(next(rngs), s.shape, s.dtype) * 0.02),
        shapes,
    )

    from v2a_tpu.models import video_unet as _vu

    # unroll 4 amortized per-step control flow (+1% on-chip) BEFORE the
    # padded stream; with the ~8% larger padded activations unroll 4
    # regresses 4.20 -> 3.37 f/s (HBM pressure), so padded defaults to 1
    default_unroll = "1" if (_vu.PERF_PADDED_STREAM or not on_tpu) else "4"
    diffusion = GaussianDiffusion(
        schedule=DiffusionSchedule.create(100, "cosine"),
        objective="pred_v", sampling_timesteps=steps,
        scan_unroll=int(os.environ.get("V2A_SCAN_UNROLL", default_unroll)),
    )

    @jax.jit
    def sample(params, rng, x_cond, task_embed):
        return diffusion.sample(
            lambda x, t, e: unet.apply(params, x, t, e),
            rng, (batch, FRAMES, hw, hw, 3), x_cond, task_embed,
        )

    rng = jax.random.PRNGKey(42)
    x_cond = jax.random.uniform(rng, (batch, 1, hw, hw, 3)) * 2.0 - 1.0
    task_embed = jax.random.normal(rng, (batch, TOKENS, 512)) * 0.1

    # NOTE: timing forces a scalar readback per iteration —
    # `block_until_ready` does not reliably block under the axon TPU relay
    checksum = jax.jit(jnp.sum)

    # warmup / compile (both programs), twice: the first post-compile call
    # can still pay one-time cache/layout costs
    np.asarray(checksum(sample(params, rng, x_cond, task_embed)))
    np.asarray(checksum(sample(params, jax.random.fold_in(rng, 999),
                               x_cond, task_embed)))

    # Robustness (round-3 fix): the round-2 driver capture landed 23% below
    # reality because a single slow-tunnel window poisoned a 3-iteration
    # MEAN. A sample call runs ~11 s on-chip, so the ~30 ms readback is
    # <0.5% overhead — the fragility was never amortization, it was using a
    # mean over too few iterations. Now: >=7 timed iterations, per-iteration
    # times in the JSON, and the headline is the MEDIAN.
    n_iters = 7 if on_tpu else 1
    iter_s = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = sample(params, jax.random.fold_in(rng, i), x_cond, task_embed)
        np.asarray(checksum(out))
        iter_s.append(time.perf_counter() - t0)
    dt = float(np.median(iter_s))

    frames_per_s = batch * FRAMES / dt
    # normalize smoke runs to the full 100-step cost
    frames_per_s *= steps / STEPS

    result = {
        "metric": "video_frames_per_sec_per_chip_ddim100",
        "value": round(float(frames_per_s), 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(float(frames_per_s) / A100_REFERENCE_FRAMES_PER_S, 3),
        "median_iter_s": round(dt, 3),
        "iter_s": [round(t, 3) for t in iter_s],
        # fraction of the measured-on-this-chip FLOP-model ceiling
        # (the defensible anchor; vs_baseline rests on an A100 estimate)
        "pct_of_flop_ceiling": round(
            100.0 * float(frames_per_s) / FLOP_MODEL_CEILING_FPS, 1),
    }

    # The headline prints IMMEDIATELY (flushed): if a driver-side timeout
    # kills the process mid-secondaries, the captured tail still ends in a
    # valid headline JSON line. When the secondaries complete, the FULL
    # superset line prints last and is the one the tail parser picks up.
    import sys

    print(json.dumps(result), flush=True)
    sys.stdout.flush()

    # -- secondary north-star metrics (VERDICT round-4 weak #3): the driver
    # records bench.py's one JSON line every round, so the policy-train and
    # exploration-cycle metrics of BASELINE.json regression-track here too.
    # Guarded: a failure/timeout in a secondary must never cost the headline.
    emitted_secondary = False
    if os.environ.get("V2A_BENCH_SECONDARY", "1") == "1":
        import importlib.util

        scripts_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "scripts")

        def _load(name):
            spec = importlib.util.spec_from_file_location(
                name, os.path.join(scripts_dir, f"{name}.py")
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod

        try:
            r = _load("bench_train").measure_chained_steps_per_s()
            r.pop("_internal", None)
            result["policy_train_steps_per_s"] = r["value"]
            result["policy_train_detail"] = r
        except Exception as e:  # noqa: BLE001
            result["policy_train_steps_per_s"] = None
            result["policy_train_error"] = repr(e)
        try:
            r = _load("bench_explore").measure_pipelined_cycle_s()
            result["explore_cycle_s"] = r["value"]
            result["explore_cycle_detail"] = r
        except Exception as e:  # noqa: BLE001
            result["explore_cycle_s"] = None
            result["explore_cycle_error"] = repr(e)
        # flush the three BASELINE.json metrics before the (newest, most
        # compile-expensive) video-train secondary: last full line wins
        print(json.dumps(result), flush=True)
        emitted_secondary = True
        # video TRAIN step (round 5): B=4 release size with the shipped
        # train_fused path (PERF.md: 301.3 -> 267.0 ms/step)
        try:
            bvt = _load("bench_video_train")
            if on_tpu:
                chain = 6
                chainf, state, bd = bvt.build_step(
                    False, 4, 128, 128, chain, train_fused=True)
                vb = 4
            else:
                chain = 2
                chainf, state, bd = bvt.build_step(False, 2, 32, 32, chain)
                vb = 2
            rngk = jax.random.PRNGKey(5)
            state, loss = chainf(state, rngk, bd)
            np.asarray(loss)  # compile + warm
            vt = []
            for k in range(3 if on_tpu else 1):
                t0 = time.perf_counter()
                state, loss = chainf(state, jax.random.fold_in(rngk, k), bd)
                np.asarray(loss)
                vt.append(time.perf_counter() - t0)
            dtv = sorted(vt)[len(vt) // 2] / chain
            result["video_train_steps_per_s"] = round(1.0 / dtv, 3)
            result["video_train_detail"] = {
                "metric": "video_train_steps_per_sec_b4_tfused",
                "value": round(1.0 / dtv, 3),
                "step_ms": round(dtv * 1e3, 1),
                "train_frames_per_sec": round(vb * FRAMES / dtv, 1),
                "unit": "steps/s/chip",
                "chain_s": [round(s, 3) for s in vt],
            }
        except Exception as e:  # noqa: BLE001
            result["video_train_steps_per_s"] = None
            result["video_train_error"] = repr(e)

    if emitted_secondary:
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
