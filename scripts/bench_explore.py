"""Exploration-cycle wall-clock: reference-style serial batch-1 vs this
framework's batched video call + pool-parallel lock-step rollouts.

Uses the REAL model sizes (video U-Net 128ch/5 levels at 128x128 bf16,
policy ResNet18x2 + 67M U-Net, DDIM 8) over the fake env backend (sim cost
~0, so the numbers isolate the TPU-call structure, which is what differs
from the reference). Prints a JSON summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from v2a_tpu.envs.fake import FakeEnvList
from v2a_tpu.envs.subproc import EnvWorkerPool
from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel
from v2a_tpu.train.explore import ExploreConfig
from v2a_tpu.train.trainer import OnlineTrainer, TrainerConfig


def measure_pipelined_cycle_s(video=None, policy=None):
    """The exploration-cycle north-star measurement (BASELINE.json metric
    3): steady-state pipelined cycle wall-clock at the release model sizes
    over the fake env (sim cost ~0 — isolates the TPU-call structure).
    Returns the result dict; also called by bench.py so BENCH_r*.json
    regression-tracks this metric every round (VERDICT round-4 weak #3)."""
    on_tpu = jax.devices()[0].platform != "cpu"
    if video is None:
        if on_tpu:
            vcfg = VideoModelConfig(dtype="bfloat16")
        else:
            vcfg = VideoModelConfig(
                image_size=(32, 32), sample_per_seq=4, timesteps=8,
                sampling_timesteps=2, model_channels=32, channel_mult=(1, 2),
                num_res_blocks=1, attention_resolutions=(8,), text_dim=64,
            )
        video = VideoPredModel(vcfg)
        video.init(jax.random.PRNGKey(0))
    if policy is None:
        if on_tpu:
            pcfg = PolicyConfig(dtype="bfloat16")
        else:
            pcfg = PolicyConfig(
                image_size=(32, 32), down_dims=(32, 64), horizon=8,
                n_action_steps=4, num_train_timesteps=10,
                num_inference_steps_ddim=2,
            )
        policy = DiffusionPolicy.create(pcfg)
    hw = video.config.image_size[0]
    n_workers = 8 if on_tpu else 2
    envs = FakeEnvList(num_tasks=8 if on_tpu else 2, img_hw=(hw, hw))
    ecfg = ExploreConfig(
        act_down_val=-0.1, n_acts_per_pred=policy.config.n_action_steps
    )
    with EnvWorkerPool(
        "fake-8tk-v0" if on_tpu else "fake-2tk-small-v0", n_workers=n_workers
    ) as pool:
        trainer = OnlineTrainer(
            policy, envs, TrainerConfig(
                randsam_path="", min_len_uB=9, pipeline_explore=True,
            ),
            "/tmp/explore_bench_np",
            video_model=video, explore_config=ecfg, seed=0, env_pool=pool,
        )
        trainer.video_guided_explore()  # compile + first (cold) cycle
        times = []
        for _ in range(3 if on_tpu else 1):
            t0 = time.perf_counter()
            trainer.video_guided_explore()
            times.append(time.perf_counter() - t0)
    return {
        "metric": "explore_cycle_pipelined_s",
        "value": round(sorted(times)[len(times) // 2], 2),
        "unit": "s/cycle",
        "vs_baseline": None,
        "iters_s": [round(t, 2) for t in times],
    }


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    vcfg = VideoModelConfig(dtype="bfloat16" if on_tpu else "float32")
    pcfg = PolicyConfig(dtype="bfloat16" if on_tpu else "float32")
    video = VideoPredModel(vcfg)
    video.init(jax.random.PRNGKey(0))
    policy = DiffusionPolicy.create(pcfg)

    envs = FakeEnvList(num_tasks=8, img_hw=(128, 128))
    tcfg = TrainerConfig(randsam_path="", min_len_uB=30)
    ecfg = ExploreConfig(act_down_val=-0.1)

    class Adapter:
        def sample(self, rng, imgs01, tasks):
            return np.asarray(video.sample(rng, imgs01, list(tasks)))

        def sample_u8(self, rng, imgs01, tasks):
            # device-side uint8 quantization: 4x less readback traffic
            return np.asarray(video.sample_u8(rng, imgs01, list(tasks)))

    results = {}

    # -- video sampling cost at batch 1 vs batch 8
    img = np.random.rand(1, 128, 128, 3).astype(np.float32)
    t0 = time.perf_counter()
    np.asarray(video.sample(jax.random.PRNGKey(1), img, ["task"]))
    results["video_batch1_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    np.asarray(video.sample(jax.random.PRNGKey(2), img, ["task"]))
    v1 = time.perf_counter() - t0
    results["video_batch1_s"] = round(v1, 2)

    img8 = np.random.rand(8, 128, 128, 3).astype(np.float32)
    tasks8 = [f"task {i}" for i in range(8)]
    t0 = time.perf_counter()
    np.asarray(video.sample(jax.random.PRNGKey(3), img8, tasks8))
    results["video_batch8_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    np.asarray(video.sample(jax.random.PRNGKey(4), img8, tasks8))
    v8 = time.perf_counter() - t0
    results["video_batch8_s"] = round(v8, 2)

    # -- serial exploration cycle (batched video + serial batch-1 rollouts)
    trainer = OnlineTrainer(
        policy, envs, tcfg, "/tmp/explore_bench_wd",
        video_model=Adapter(), explore_config=ecfg, seed=0,
    )
    trainer.video_guided_explore()  # compile policy batch-1
    t0 = time.perf_counter()
    trainer.video_guided_explore()
    serial = time.perf_counter() - t0
    results["explore_serial_s"] = round(serial, 1)

    # -- parallel exploration cycle (pool of 8 + lock-step batch-8 policy)
    with EnvWorkerPool("fake-8tk-v0", n_workers=8) as pool:
        trainer_p = OnlineTrainer(
            policy, envs, tcfg, "/tmp/explore_bench_wd2",
            video_model=Adapter(), explore_config=ecfg, seed=0,
            env_pool=pool,
        )
        trainer_p.video_guided_explore()  # compile policy batch-8
        t0 = time.perf_counter()
        trainer_p.video_guided_explore()
        par = time.perf_counter() - t0
    results["explore_parallel_s"] = round(par, 1)

    # -- pipelined cycles (cfg.pipeline_explore): next cycle's video chain
    # dispatched in chunks behind this cycle's rollout policy programs.
    # Steady-state cycle ~ max(video, rollouts); measure the SECOND+ cycles
    # (the first pays the un-prefetched chain synchronously).
    with EnvWorkerPool("fake-8tk-v0", n_workers=8) as pool:
        trainer_pl = OnlineTrainer(
            policy, envs, TrainerConfig(
                randsam_path="", min_len_uB=30, pipeline_explore=True,
            ),
            "/tmp/explore_bench_wd3",
            video_model=video, explore_config=ecfg, seed=0,
            env_pool=pool,
        )
        trainer_pl.video_guided_explore()  # compile + first (cold) cycle
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            trainer_pl.video_guided_explore()
            times.append(time.perf_counter() - t0)
        pipelined = sorted(times)[len(times) // 2]
    results["explore_pipelined_s"] = round(pipelined, 1)
    results["explore_pipelined_iters_s"] = [round(t, 1) for t in times]

    # reference-style estimate: 8 separate batch-1 video samples instead of
    # one batch-8 call, same serial rollouts
    ref_style = serial - v8 + 8 * v1
    results["explore_reference_style_est_s"] = round(ref_style, 1)
    results["speedup_vs_reference_style"] = round(ref_style / par, 2)
    results["speedup_pipelined_vs_reference_style"] = round(
        ref_style / pipelined, 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
