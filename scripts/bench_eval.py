"""Deployment-path benchmark: `predict_action` DDIM-8 latency + one full
eval-episode wall-clock (VERDICT round-4 weak #5).

The rollout-critical device call during eval is the policy's 8-step DDIM
action chain, issued ~35-75x per episode between receding-horizon video
replans (`diffuser/libero/lb_eval_helper.py:233-268`); the reference records
per-episode run times (`lb_eval_helper.py:183,347`) but publishes no
latency. This measures, at the release policy configuration with the
eval-time overrides of `plan_lb.py:67-74` (DDIM 8, 8 actions/pred,
ddpm_var_temp 0.5):

- `predict_action` DEVICE latency at batch 1 and 8 via a scan-chained
  program (one dispatch + readback per chain — the axon-tunnel dispatch
  (~24-30 ms) would otherwise dominate sub-50 ms calls, PERF.md round 3),
- the raw single-call wall latency including dispatch (what a serial
  rollout loop actually waits),
- one full fake-env eval episode wall-clock with the release replanning
  cadence (5 video predictions x DDIM-100 batch-1 video samples, 5 policy
  predictions per guidance frame), via `Evaluator.eval_1_env`.

Prints ONE JSON line.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig


def _median(xs):
    return float(sorted(xs)[len(xs) // 2])


def bench_predict_latency(policy, params, batch, hw, on_tpu, chain_len=32):
    """(device_ms_per_call, raw_single_call_ms) at the given batch size."""
    predict = lambda p, r, obs: policy.predict_action(p, r, obs, use_ddim=True)  # noqa: E731

    rs = np.random.RandomState(0)
    obs = {
        k: jnp.asarray(rs.rand(batch, hw, hw, 3), jnp.float32)
        for k in policy.config.obs_keys
    }

    # scan-chained: K sequential DDIM chains inside one program; per-call
    # device time = chain time / K (amortizes the tunnel round trip)
    k_chain = chain_len if on_tpu else 2

    def chained(p, key, obs):
        def body(acc, i):
            out = predict(p, jax.random.fold_in(key, i), obs)
            return acc + jnp.sum(out["action"]), 0.0
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(k_chain)
        )
        return acc

    chain = jax.jit(chained)
    key = jax.random.PRNGKey(0)
    np.asarray(chain(params, key, obs))  # compile
    chain_s = []
    for i in range(5 if on_tpu else 2):
        t0 = time.perf_counter()
        np.asarray(chain(params, jax.random.fold_in(key, 100 + i), obs))
        chain_s.append(time.perf_counter() - t0)
    device_ms = _median(chain_s) / k_chain * 1e3

    # raw single-call wall latency (incl. dispatch): what a serial rollout
    # loop actually waits per prediction
    single = jax.jit(predict)
    np.asarray(single(params, key, obs)["action"])  # compile
    raw_s = []
    for i in range(9 if on_tpu else 2):
        t0 = time.perf_counter()
        np.asarray(single(params, jax.random.fold_in(key, 200 + i), obs)["action"])
        raw_s.append(time.perf_counter() - t0)
    return device_ms, _median(raw_s) * 1e3


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    hw = 128 if on_tpu else 32

    # release policy + the eval-time overrides of `plan_lb.py:67-74`
    if on_tpu:
        pcfg = PolicyConfig(
            dtype="bfloat16", num_inference_steps_ddim=8,
            n_action_steps=8, ddpm_var_temp=0.5,
        )
    else:
        pcfg = PolicyConfig(
            image_size=(32, 32), down_dims=(32, 64), horizon=8,
            n_action_steps=4, num_train_timesteps=10,
            num_inference_steps_ddim=8,
        )
    policy = DiffusionPolicy.create(pcfg)
    params = policy.init(jax.random.PRNGKey(0))

    out = {"metric": "eval_deployment_latency", "unit": "ms", "vs_baseline": None}
    d1, r1 = bench_predict_latency(policy, params, 1, hw, on_tpu)
    d8, r8 = bench_predict_latency(policy, params, 8, hw, on_tpu)
    out["predict_action_ddim8_b1_device_ms"] = round(d1, 2)
    out["predict_action_ddim8_b1_wall_ms"] = round(r1, 2)
    out["predict_action_ddim8_b8_device_ms"] = round(d8, 2)
    out["predict_action_ddim8_b8_wall_ms"] = round(r8, 2)
    out["value"] = round(d1, 2)

    # -- one full eval episode: fake env (sim cost ~0), release video model,
    # release replanning cadence. Worst-case cost: the random-init policy
    # never succeeds, so the episode runs all its frame slots.
    if os.environ.get("V2A_BENCH_EVAL_EPISODE", "1") == "1":
        from v2a_tpu.envs.fake import FakeEnvList
        from v2a_tpu.eval.harness import EvalConfig, Evaluator
        from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel

        vcfg = (
            VideoModelConfig(dtype="bfloat16")
            if on_tpu
            else VideoModelConfig(
                image_size=(32, 32), sample_per_seq=4, timesteps=8,
                sampling_timesteps=2, model_channels=32, channel_mult=(1, 2),
                num_res_blocks=1, attention_resolutions=(8,), text_dim=64,
            )
        )
        video = VideoPredModel(vcfg)
        video.init(jax.random.PRNGKey(1))

        envs = FakeEnvList(num_tasks=1, img_hw=(hw, hw))
        rng_holder = {"rng": jax.random.PRNGKey(7)}
        predict = jax.jit(
            lambda p, r, obs: policy.predict_action(p, r, obs, use_ddim=True)
        )

        def policy_fn(img_obs01, img_goal01):
            rng_holder["rng"], sub = jax.random.split(rng_holder["rng"])
            res = predict(params, sub, {
                "img_obs_1": jnp.asarray(img_obs01),
                "img_goal_1": jnp.asarray(img_goal01),
            })
            return np.asarray(res["action"][0])

        def video_fn(img01, task):
            rng_holder["rng"], sub = jax.random.split(rng_holder["rng"])
            return np.asarray(video.sample_u8(sub, img01[None], [task])[0])

        ecfg = EvalConfig(
            n_seeds=1, vis=False,
            eval_n_preds_betw_vframes=5 if on_tpu else 1,
            num_vid_pred_per_ep=5 if on_tpu else 2,
            use_vid_first_n_frames=2,
            n_acts_per_pred=min(8, pcfg.horizon) if on_tpu else pcfg.n_action_steps,
        )
        evaluator = Evaluator(
            envs, policy_fn, video_fn,
            video_horizon=vcfg.video_future_horizon, config=ecfg,
        )
        task = envs.task_list[0]
        env_idx = envs.seed_sets[task][0]
        # warmup episode compiles the batch-1 video + policy programs
        envs.init_1_given_env(task, env_idx, e_seed=100)
        t0 = time.perf_counter()
        evaluator.eval_1_env(task, "agent", env_idx)
        envs.close_1_given_env(task, env_idx)
        out["eval_episode_warmup_s"] = round(time.perf_counter() - t0, 1)

        ep_s = []
        for seed in (101, 102):
            envs.init_1_given_env(task, env_idx, e_seed=seed)
            res = evaluator.eval_1_env(task, "agent", env_idx)
            envs.close_1_given_env(task, env_idx)
            ep_s.append(res.run_time)
        out["eval_episode_wall_s"] = round(_median(ep_s), 2)
        out["eval_episode_iters_s"] = [round(s, 2) for s in ep_s]
        out["eval_episode_n_video_preds"] = ecfg.num_vid_pred_per_ep
        out["eval_episode_video_ddim_steps"] = vcfg.sampling_timesteps

    print(json.dumps(out))


if __name__ == "__main__":
    main()
