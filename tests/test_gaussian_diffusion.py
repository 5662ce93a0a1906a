"""Tests for the video-family diffusion (GaussianDiffusion).

The key correctness targets: parameterization conversion identities, the
DDIM time-pairing convention, analytic sampling against a known-linear
"oracle" denoiser, and CFG degenerating correctly at guidance weight 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
from v2a_tpu.ops.schedules import DiffusionSchedule


def make_diff(**kw):
    sched = DiffusionSchedule.create(kw.pop("timesteps", 100), kw.pop("beta_schedule", "cosine"))
    return GaussianDiffusion(schedule=sched, **kw)


def test_parameterization_roundtrips():
    d = make_diff(objective="pred_v")
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 3))
    noise = jax.random.normal(k2, (4, 8, 8, 3))
    t = jax.random.randint(k3, (4,), 0, 100)

    x_t = d.q_sample(x0, t, noise)
    # recover x0 from noise
    np.testing.assert_allclose(
        d.predict_start_from_noise(x_t, t, noise), x0, atol=1e-4
    )
    # recover noise from x0
    np.testing.assert_allclose(
        d.predict_noise_from_start(x_t, t, x0), noise, atol=2e-3
    )
    # v parameterization roundtrip
    v = d.predict_v(x0, t, noise)
    np.testing.assert_allclose(d.predict_start_from_v(x_t, t, v), x0, atol=1e-4)


def test_ddim_time_pairs_convention():
    d = make_diff(sampling_timesteps=10)
    pairs = d.ddim_time_pairs()
    # linspace(-1, 99, 11).int() = [-1, 9, 19, ..., 99] -> reversed pairs
    assert pairs[0].tolist() == [99, 89]
    assert pairs[-1].tolist() == [9, -1]
    assert pairs.shape == (10, 2)
    # full-step sampling is ancestral, fewer steps is ddim
    assert d.is_ddim_sampling
    assert not make_diff(sampling_timesteps=100).is_ddim_sampling


def _oracle_model(d):
    """A denoiser with perfect knowledge that x0 == x_cond (in [-1,1]).

    For objective pred_v, the ideal output is v = (sqrt_acp*x_t - x0*1)/...
    derived from predict_v with noise = (x_t - sqrt_acp x0)/sqrt_1macp.
    """

    def model_fn(x_in, t, task_embed):
        x = x_in[..., :3]
        x_cond = x_in[..., 3:]
        s = d.schedule
        sqrt_acp = s.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        sqrt_1m = s.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        x0 = x_cond
        noise = (x - sqrt_acp * x0) / jnp.maximum(sqrt_1m, 1e-8)
        return sqrt_acp * noise - sqrt_1m * x0

    return model_fn


def test_ddim_sampler_recovers_oracle_target():
    """With an oracle denoiser pointing at x_cond, DDIM must converge to it."""
    d = make_diff(objective="pred_v", sampling_timesteps=20)
    target01 = jnp.full((2, 8, 8, 3), 0.75)
    x_cond = target01 * 2 - 1  # model oracle works in [-1, 1]
    out = d.ddim_sample(
        _oracle_model(d), jax.random.PRNGKey(1), (2, 8, 8, 3), x_cond,
        jnp.zeros((2, 4, 16)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(target01), atol=5e-3)


def test_ancestral_sampler_recovers_oracle_target():
    d = make_diff(objective="pred_v", timesteps=50, sampling_timesteps=50, var_temp=0.5)
    target01 = jnp.full((2, 8, 8, 3), 0.25)
    x_cond = target01 * 2 - 1
    out = d.sample(
        _oracle_model(d), jax.random.PRNGKey(2), (2, 8, 8, 3), x_cond,
        jnp.zeros((2, 4, 16)),
    )
    assert float(jnp.abs(out - target01).mean()) < 0.05


def test_cfg_zero_weight_matches_uncond_path():
    """guidance_weight=0 must produce identical predictions to the plain path."""
    d0 = make_diff(objective="pred_v", guidance_weight=0.0)
    dg = make_diff(objective="pred_v", guidance_weight=0.5)

    def embed_sensitive_model(x_in, t, task_embed):
        # output depends on the task embedding mean, so CFG changes results
        bias = task_embed.mean(axis=(1, 2)).reshape(-1, 1, 1, 1)
        return x_in[..., :3] * 0.1 + bias

    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    x_cond = jnp.zeros((2, 8, 8, 3))
    te = jnp.ones((2, 4, 16))
    t = jnp.array([10, 50])

    p0 = d0.model_predictions(embed_sensitive_model, x, t, x_cond, te)
    pg = dg.model_predictions(embed_sensitive_model, x, t, x_cond, te)
    # with a nonzero embedding the guided prediction must differ
    assert not np.allclose(p0.pred_noise, pg.pred_noise)
    # but with a zero embedding cond==uncond, so guidance is a no-op
    pg0 = dg.model_predictions(
        embed_sensitive_model, x, t, x_cond, jnp.zeros_like(te)
    )
    p00 = d0.model_predictions(
        embed_sensitive_model, x, t, x_cond, jnp.zeros_like(te)
    )
    np.testing.assert_allclose(pg0.pred_noise, p00.pred_noise, atol=1e-5)


def test_p_losses_zero_for_perfect_model():
    d = make_diff(objective="pred_v", min_snr_loss_weight=True)

    def perfect(x_in, t, task_embed):
        # x_start is fixed at 0.5 in [0,1] => 0.0 in [-1,1]; noise recoverable
        x = x_in[..., :3]
        s = d.schedule
        sqrt_acp = s.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        sqrt_1m = s.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        noise = x / jnp.maximum(sqrt_1m, 1e-8)
        return sqrt_acp * noise  # v with x0 = 0

    x_start = jnp.full((4, 8, 8, 3), 0.5)
    x_cond = jnp.zeros((4, 8, 8, 3))
    loss = d.p_losses(
        perfect, jax.random.PRNGKey(4), x_start, x_cond, jnp.zeros((4, 4, 16))
    )
    assert float(loss) < 1e-6


def test_sample_output_clamped_and_jittable():
    d = make_diff(objective="pred_noise", sampling_timesteps=5)

    def noisy_model(x_in, t, task_embed):
        return x_in[..., :3] * 2.0  # arbitrary -> would exceed [0,1]

    f = jax.jit(
        lambda rng: d.sample(
            noisy_model, rng, (1, 8, 8, 3), jnp.zeros((1, 8, 8, 3)),
            jnp.zeros((1, 4, 16)),
        )
    )
    out = f(jax.random.PRNGKey(5))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_video_rank_broadcasting_of_cond():
    """x of rank 5 (B,F,H,W,C) with x_cond (B,1,H,W,C) must work — the cond
    frame is tiled over frames as in `flowdiffusion/flowdiffusion/unet.py:
    216-219`."""
    d = make_diff(objective="pred_v", sampling_timesteps=4)
    seen_shapes = []

    def probe(x_in, t, task_embed):
        seen_shapes.append(x_in.shape)
        return x_in[..., :3] * 0.0

    out = d.ddim_sample(
        probe, jax.random.PRNGKey(6), (2, 7, 8, 8, 3),
        jnp.zeros((2, 1, 8, 8, 3)), jnp.zeros((2, 4, 16)),
    )
    assert out.shape == (2, 7, 8, 8, 3)
    assert seen_shapes[0] == (2, 7, 8, 8, 6)
