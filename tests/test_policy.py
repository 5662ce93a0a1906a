"""Tests for the action-diffusion policy stack: shapes, parameter counts vs
the reference architecture, determinism of DDIM rollout, and learning on a
toy problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2a_tpu.models.normalizer import lb_action_normalizer
from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
from v2a_tpu.models.unet1d import ConditionalUnet1D, SinusoidalPosEmb
from v2a_tpu.models.vision import MultiImageObsEncoder, SpatialSoftmax


SMALL = PolicyConfig(image_size=(64, 64), down_dims=(64, 128), horizon=16)


@pytest.fixture(scope="module")
def small_policy():
    policy = DiffusionPolicy.create(SMALL)
    params = policy.init(jax.random.PRNGKey(0))
    return policy, params


def _batch(b=2, cfg=SMALL):
    h, w = cfg.image_size
    rs = np.random.RandomState(0)
    return {
        "obs": {
            k: jnp.asarray(rs.rand(b, h, w, 3), jnp.float32) for k in cfg.obs_keys
        },
        "action": jnp.asarray(
            rs.uniform(-1, 1, (b, cfg.horizon, cfg.action_dim)), jnp.float32
        ),
    }


def test_normalizer_roundtrip():
    norm = lb_action_normalizer()
    x = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (4, 16, 7)), jnp.float32)
    np.testing.assert_allclose(norm.unnormalize(norm.normalize(x)), x, atol=1e-6)
    # out-of-range unnormalize clamps
    y = norm.unnormalize(jnp.full((1, 7), 2.0))
    np.testing.assert_allclose(y, np.ones((1, 7)), atol=1e-6)


def test_sinusoidal_pos_emb_matches_reference_formula():
    """[sin | cos] ordering with (half_dim - 1) denominator
    (`positional_embedding.py:10-17`)."""
    dim = 8
    emb = SinusoidalPosEmb(dim)
    out = emb.apply({}, jnp.asarray([3.0]))
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    args = 3.0 * freqs
    expected = np.concatenate([np.sin(args), np.cos(args)])
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-5)


def test_unet1d_shapes_and_upsampling():
    net = ConditionalUnet1D(input_dim=7, down_dims=(32, 64, 128))
    x = jnp.zeros((2, 16, 7))
    t = jnp.asarray([0, 5])
    cond = jnp.zeros((2, 128))
    params = net.init(jax.random.PRNGKey(0), x, t, cond)
    out = net.apply(params, x, t, cond)
    assert out.shape == (2, 16, 7)
    # odd horizon would break stride-2 down/up symmetry; 16 -> 8 -> 4 -> 8 -> 16


def test_unet1d_param_count_matches_reference_architecture():
    """The released config (dsed=128, dims 256/512/1024, k=5, cond 256) has a
    known parameter count computed independently from the layer algebra of
    `conditional_unet1d.py`; checkpoint conversion relies on an exact
    match."""
    net = ConditionalUnet1D(
        input_dim=7, down_dims=(256, 512, 1024), diffusion_step_embed_dim=128,
        kernel_size=5, n_groups=8, cond_predict_scale=True,
    )
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 7)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 128)),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

    def conv1d(i, o, k, bias=True):
        return i * o * k + (o if bias else 0)

    def block(i, o, k):  # Conv1dBlock: conv + GN(scale,bias)
        return conv1d(i, o, k) + 2 * o

    def res(i, o, k, cond):  # 2 blocks + FiLM dense + residual 1x1
        film = (cond * 2 * o) + 2 * o
        resid = conv1d(i, o, 1) if i != o else 0
        return block(i, o, k) + block(o, o, k) + film + resid

    cond = 128 + 128
    expected = (
        # time MLP: 128->512->128
        (128 * 512 + 512) + (512 * 128 + 128)
        # down: (7,256)x2(+down) (256,512)x2(+down) (512,1024)x2
        + res(7, 256, 5, cond) + res(256, 256, 5, cond) + conv1d(256, 256, 3)
        + res(256, 512, 5, cond) + res(512, 512, 5, cond) + conv1d(512, 512, 3)
        + res(512, 1024, 5, cond) + res(1024, 1024, 5, cond)
        # mid x2
        + 2 * res(1024, 1024, 5, cond)
        # up: (2048->512)x.. + upsample(512), (1024->256) + upsample(256)
        + res(2048, 512, 5, cond) + res(512, 512, 5, cond) + conv1d(512, 512, 4)
        + res(1024, 256, 5, cond) + res(256, 256, 5, cond) + conv1d(256, 256, 4)
        # final: block(256,256,5) + conv1d(256,7,1)
        + block(256, 256, 5) + conv1d(256, 7, 1)
    )
    assert n == expected


def test_spatial_softmax_finds_peak():
    """A delta at a known location must produce keypoints near its grid
    coordinate (x from W axis, y from H axis)."""
    ss = SpatialSoftmax(num_kp=1, temperature=0.01)
    feat = np.zeros((1, 8, 8, 1), np.float32)
    feat[0, 2, 6, 0] = 10.0  # row 2 (y), col 6 (x)
    params = ss.init(jax.random.PRNGKey(0), jnp.asarray(feat))
    # force identity-ish 1x1 conv: set kernel to 1, bias 0
    params = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) if p.ndim == 4 else jnp.zeros_like(p), params)
    out = ss.apply(params, jnp.asarray(feat))
    x, y = float(out[0, 0, 0]), float(out[0, 0, 1])
    grid = np.linspace(-1, 1, 8)
    assert abs(x - grid[6]) < 0.05
    assert abs(y - grid[2]) < 0.05


def test_obs_encoder_output_dim(small_policy):
    policy, params = small_policy
    h, w = SMALL.image_size
    obs = {k: jnp.zeros((3, h, w, 3)) for k in SMALL.obs_keys}
    feats = policy.encode_obs(params, obs)
    assert feats.shape == (3, 128)


def test_policy_loss_finite_and_grads_flow(small_policy):
    policy, params = small_policy
    batch = _batch()
    loss, grads = jax.value_and_grad(
        lambda p: policy.loss(p, jax.random.PRNGKey(1), batch)
    )(params)
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0


def test_predict_action_shapes_and_slicing(small_policy):
    policy, params = small_policy
    batch = _batch(b=1)
    out = policy.predict_action(params, jax.random.PRNGKey(2), batch["obs"])
    assert out["action"].shape == (1, 8, 7)
    assert out["action_pred"].shape == (1, 16, 7)
    # slice is action_pred[:, To-1 : To-1+8] (diffusion_unet_image_policy.py:190-193)
    np.testing.assert_allclose(
        np.asarray(out["action"]), np.asarray(out["action_pred"][:, 0:8])
    )
    # actions are in range after unnormalize-clamp
    assert float(jnp.abs(out["action"]).max()) <= 1.0 + 1e-5


def test_ddim_rollout_deterministic_given_key(small_policy):
    policy, params = small_policy
    batch = _batch(b=1)
    a1 = policy.predict_action(params, jax.random.PRNGKey(3), batch["obs"])
    a2 = policy.predict_action(params, jax.random.PRNGKey(3), batch["obs"])
    np.testing.assert_array_equal(np.asarray(a1["action"]), np.asarray(a2["action"]))


def test_policy_learns_constant_action():
    """A few Adam steps on a fixed batch must reduce the loss by a lot —
    the end-to-end gradient path through encoder + U-Net works."""
    import optax

    cfg = PolicyConfig(
        image_size=(32, 32), down_dims=(32, 64), horizon=4, n_action_steps=2,
        num_train_timesteps=10, num_inference_steps=10, num_inference_steps_ddim=2,
    )
    policy = DiffusionPolicy.create(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    batch = _batch(b=4, cfg=cfg)

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(policy.loss)(params, rng, batch)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(10)
    losses = []
    for i in range(30):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9


def test_vmap_enc_matches_per_key_path(small_policy, monkeypatch):
    """The stacked-trunk vmapped encoder (PERF_VMAP_ENC) must reproduce the
    per-key MultiImageObsEncoder path on the same params: same features,
    same loss, same DDIM rollout."""
    from v2a_tpu.models import policy as policy_mod

    policy, params = small_policy
    batch = _batch(b=3)
    rng = jax.random.PRNGKey(7)

    ref_feat = policy.encode_obs(params, batch["obs"])
    ref_loss = policy.loss(params, rng, batch)
    ref_act = policy.predict_action(params, rng, batch["obs"])

    monkeypatch.setattr(policy_mod, "PERF_VMAP_ENC", True)
    got_feat = policy.encode_obs(params, batch["obs"])
    got_loss = policy.loss(params, rng, batch)
    got_act = policy.predict_action(params, rng, batch["obs"])

    np.testing.assert_allclose(
        np.asarray(got_feat), np.asarray(ref_feat), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        float(got_loss), float(ref_loss), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_act["action_pred"]),
        np.asarray(ref_act["action_pred"]),
        rtol=1e-4, atol=1e-4,
    )
