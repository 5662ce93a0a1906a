"""The learning gate (VERDICT round-4 missing #1 / ask #1).

The reference's de-facto acceptance test is the end-to-end eval success
rate (`diffuser/libero/lb_eval_helper.py:84-163`, SURVEY §4.6): the whole
point of the framework is that training *produces a policy that succeeds*.
Every other test in this suite asserts equivalence, wiring, or golden
parity; these assert the system LEARNS.

Tier (a) — supervised overfit (CI): train the diffusion policy on a fixed
buffer of fake-env oracle episodes (noisy expert reaching for the object)
and assert
  - the diffusion loss falls by >8x,
  - predicted actions point in the ORACLE direction (recomputed noise-free
    from the decoded frame state, on approach-phase windows where the
    direction is well-defined): mean cosine > 0.6, all-positive fraction
    > 0.9 (measured: 0.91 / 1.00 after 250 steps),
  - the gripper channel agrees with the goal frame's gripper state > 80%
    (measured: 0.95).
A dead optimizer, a flipped normalizer sign, a broken goal relabeling, or
a vision trunk that cannot localize the object all turn this red.

Tier (b) — the closed-loop gate (eval success beats random) lives in
`test_learning_closed_loop.py` (slow).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from v2a_tpu.data.replay_buffer import ReplayBuffer
from v2a_tpu.envs.fake import FakeEnvList
from v2a_tpu.envs.fake_oracle import (
    collect_oracle_episodes, decode_frame, oracle_action,
)
from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
from v2a_tpu.train.train_state import EMAConfig, TrainState, make_train_step

HORIZON = 8


def _small_policy() -> DiffusionPolicy:
    cfg = PolicyConfig(
        image_size=(32, 32), down_dims=(64, 128), horizon=HORIZON,
        n_action_steps=4, num_train_timesteps=10, num_inference_steps=10,
        num_inference_steps_ddim=5, obs_feature_dim=32, num_kp=16,
        diffusion_step_embed_dim=64,
        vision_stage_sizes=(1, 1), vision_stage_features=(32, 64),
    )
    return DiffusionPolicy.create(cfg)


def _oracle_buffer(envs, rng, eps_per_task=6, ep_len=16, noise=0.1):
    eps = collect_oracle_episodes(
        envs, eps_per_task=eps_per_task, ep_len=ep_len, rng=rng,
        action_noise=noise,
    )
    buf = ReplayBuffer(
        max_episodes=32, min_len=10, sample_act_seq_len=HORIZON,
        backend="python",
    )
    for e in eps:
        buf.add_episode(e["task"], e["cam"], e["env_idx"], e["imgs"], e["acts"])
    return buf


def test_oracle_action_points_at_object():
    act = oracle_action(
        np.array([0.0, 0.0, 0.8]), np.array([0.2, -0.2, 0.46]),
        step_scale=0.05, close_dist=0.15,
    )
    assert act[0] > 0 and act[1] < 0 and act[2] < 0
    assert act[6] < 0  # far: gripper open
    near = oracle_action(
        np.array([0.2, -0.2, 0.5]), np.array([0.2, -0.2, 0.46]),
        step_scale=0.05, close_dist=0.15,
    )
    assert near[6] > 0  # close: gripper closes


def test_decode_frame_inverts_render():
    envs = FakeEnvList(num_tasks=1, img_hw=(32, 32), step_scale=0.05)
    task = envs.task_list[0]
    env_idx = envs.seed_sets[task][0]
    envs.init_1_given_env(task, env_idx, e_seed=4242)
    obs = envs.get_an_env_obs(task, env_idx)
    st = decode_frame(envs.render_an_env(task, "agent", env_idx))
    envs.close_1_given_env(task, env_idx)
    # pixel quantization at 32x32 bounds position recovery to ~1/31
    np.testing.assert_allclose(st["ee_pos"][:2], obs["robot0_eef_pos"][:2],
                               atol=0.05)
    np.testing.assert_allclose(st["obj_pos"][:2], obs["obj_pos"][:2],
                               atol=0.05)
    assert abs(st["ee_pos"][2] - obs["robot0_eef_pos"][2]) < 0.05
    assert not st["gripper_closed"]


def test_decode_frame_bright_backgrounds():
    """Regression: backgrounds 20+10*(task_idx%16) reach 120-170 for
    task_idx%16 >= 10; an absolute ch0 threshold classified the whole
    background as the EE. Decode must invert the render for EVERY task
    background and every EE height."""
    from v2a_tpu.envs.fake import render_state

    for task_idx in (74, 79, 65):  # bg 120, 170, 30
        for z in (0.4, 0.46, 0.525, 0.8, 1.0):
            ee = np.asarray([0.2, -0.1, z], np.float32)
            obj = np.asarray([-0.2, 0.2, 0.46], np.float32)
            img = render_state(task_idx, ee, obj, -1.0, 3, (32, 32))
            st = decode_frame(img)
            np.testing.assert_allclose(st["ee_pos"][:2], ee[:2], atol=0.05)
            np.testing.assert_allclose(st["obj_pos"][:2], obj[:2], atol=0.05)
            assert abs(st["ee_pos"][2] - z) < 0.02, (task_idx, z)
        # grasp overlap: the EE square fully inside the object square must
        # still decode (both masks claim the shared pixels)
        obj = np.asarray([0.0, 0.0, 0.46], np.float32)
        ee = np.asarray([0.0, 0.0, 0.46], np.float32)
        st = decode_frame(render_state(task_idx, ee, obj, 1.0, 5, (32, 32)))
        np.testing.assert_allclose(st["ee_pos"][:2], ee[:2], atol=0.05)
        np.testing.assert_allclose(st["obj_pos"][:2], obj[:2], atol=0.05)
        assert st["gripper_closed"]


@pytest.mark.slow
def test_policy_learns_oracle_behavior():
    envs = FakeEnvList(
        num_tasks=2, img_hw=(32, 32), step_scale=0.05, grasp_radius=0.15
    )
    rng = np.random.default_rng(0)
    buf = _oracle_buffer(envs, rng)

    policy = _small_policy()
    params = policy.init(jax.random.PRNGKey(0))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(1e-3, weight_decay=1e-6)
    )
    state = TrainState.create(params, tx)
    step_fn = jax.jit(
        make_train_step(policy.loss, tx, EMAConfig()), donate_argnums=(0,)
    )

    def to_batch(hb):
        return {
            "obs": {
                "img_obs_1": jnp.asarray(hb["img_obs"], jnp.float32) / 255.0,
                "img_goal_1": jnp.asarray(hb["img_goal"], jnp.float32) / 255.0,
            },
            "action": jnp.asarray(hb["action"]),
        }

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(250):
        hb = buf.sample_batch(32, rng, horizon=HORIZON)
        key, sub = jax.random.split(key)
        state, loss, _gn = step_fn(state, sub, to_batch(hb))
        losses.append(float(loss))
    first, last = np.mean(losses[:5]), np.mean(losses[-20:])
    assert last < first / 8.0, f"loss did not fall 8x: {first:.3f} -> {last:.3f}"

    # -- oracle-direction check on approach-phase windows -------------------
    hb = buf.sample_batch(256, rng, horizon=HORIZON)
    pred = jax.jit(
        lambda p, r, o: policy.predict_action(p, r, o, use_ddim=True)
    )(state.ema_params, jax.random.PRNGKey(42), to_batch(hb)["obs"])
    ap = np.asarray(pred["action_pred"])  # (B, H, 7)

    cos, grip_true, grip_pred = [], [], []
    for b in range(ap.shape[0]):
        st = decode_frame(hb["img_obs"][b])
        gl = decode_frame(hb["img_goal"][b])
        grip_true.append(gl["gripper_closed"])
        grip_pred.append(float(ap[b, :, 6].mean()) > 0)
        delta = st["obj_pos"] - st["ee_pos"]
        dist = float(np.linalg.norm(delta))
        if dist < 0.18:  # hover/grasp: direction ill-defined
            continue
        pm = ap[b, :4, :3].mean(axis=0)
        nm = float(np.linalg.norm(pm))
        cos.append(0.0 if nm < 1e-6 else float(pm / nm @ (delta / dist)))
    cos = np.asarray(cos)
    assert len(cos) >= 50, f"too few approach windows sampled: {len(cos)}"
    assert cos.mean() > 0.6, f"oracle-direction cosine too low: {cos.mean():.3f}"
    assert np.mean(cos > 0) > 0.9, f"direction sign wrong on {np.mean(cos <= 0):.0%}"
    grip_agree = float(np.mean(np.asarray(grip_true) == np.asarray(grip_pred)))
    assert grip_agree > 0.8, f"gripper does not track goal stripe: {grip_agree:.3f}"
