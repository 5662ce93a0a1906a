"""Golden tests for the diffusers-family DDPM/DDIM schedulers.

Step math is verified against an independent float64 numpy oracle written
from the DDPM/DDIM papers' closed forms (the same equations diffusers
implements), plus convention tests for the "leading" timestep spacing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from v2a_tpu.ops.action_scheduler import (
    DDIMScheduler,
    DDPMScheduler,
    leading_timesteps,
)


def _np_tables(T=100):
    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    betas = np.array(
        [min(1 - alpha_bar((i + 1) / T) / alpha_bar(i / T), 0.999) for i in range(T)]
    )
    return betas, np.cumprod(1 - betas)


def test_leading_timesteps_convention():
    assert leading_timesteps(100, 8).tolist() == [84, 72, 60, 48, 36, 24, 12, 0]
    assert leading_timesteps(100, 100).tolist() == list(range(99, -1, -1))
    assert leading_timesteps(100, 8, steps_offset=1).tolist() == [
        85, 73, 61, 49, 37, 25, 13, 1,
    ]
    with pytest.raises(ValueError):
        leading_timesteps(100, 101)


def test_add_noise_matches_closed_form():
    sch = DDPMScheduler.create()
    _, acp = _np_tables()
    x0 = np.random.RandomState(0).randn(4, 16, 7).astype(np.float32)
    noise = np.random.RandomState(1).randn(4, 16, 7).astype(np.float32)
    t = np.array([0, 10, 50, 99])
    out = sch.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t))
    expected = (
        np.sqrt(acp[t])[:, None, None] * x0
        + np.sqrt(1 - acp[t])[:, None, None] * noise
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=1e-6)


def test_ddpm_step_matches_numpy_oracle():
    sch = DDPMScheduler.create()
    betas, acp = _np_tables()
    rs = np.random.RandomState(2)
    sample = rs.randn(2, 16, 7).astype(np.float32) * 0.5
    eps = rs.randn(2, 16, 7).astype(np.float32) * 0.1
    noise = rs.randn(2, 16, 7).astype(np.float32)

    for t_int in [99, 50, 1, 0]:
        prev_t = t_int - 1
        out = sch.step(
            jnp.asarray(eps), jnp.asarray(t_int), jnp.asarray(prev_t),
            jnp.asarray(sample), jnp.asarray(noise),
        )
        # numpy oracle (float64)
        a_t = acp[t_int]
        a_prev = acp[prev_t] if prev_t >= 0 else 1.0
        b_t = 1 - a_t
        b_prev = 1 - a_prev
        cur_alpha = a_t / a_prev
        cur_beta = 1 - cur_alpha
        x0 = (sample - np.sqrt(b_t) * eps) / np.sqrt(a_t)
        x0 = np.clip(x0, -1, 1)
        coef1 = np.sqrt(a_prev) * cur_beta / b_t
        coef2 = np.sqrt(cur_alpha) * b_prev / b_t
        prev = coef1 * x0 + coef2 * sample
        if t_int > 0:
            var = max(b_prev / b_t * cur_beta, 1e-20)
            prev = prev + np.sqrt(var) * noise
        np.testing.assert_allclose(np.asarray(out), prev, rtol=2e-4, atol=2e-5)


def test_ddpm_var_temp_scales_noise_only():
    sch = DDPMScheduler.create()
    rs = np.random.RandomState(3)
    sample = jnp.asarray(rs.randn(1, 16, 7).astype(np.float32))
    eps = jnp.asarray(rs.randn(1, 16, 7).astype(np.float32))
    noise = jnp.asarray(rs.randn(1, 16, 7).astype(np.float32))
    t, pt = jnp.asarray(50), jnp.asarray(49)
    full = sch.step(eps, t, pt, sample, noise, var_temp=1.0)
    cold = sch.step(eps, t, pt, sample, noise, var_temp=0.0)
    mid = sch.step(eps, t, pt, sample, noise, var_temp=0.5)
    np.testing.assert_allclose(
        np.asarray(mid), np.asarray((full + cold) / 2), atol=1e-6
    )


def test_ddim_step_matches_numpy_oracle():
    sch = DDIMScheduler.create()
    _, acp = _np_tables()
    rs = np.random.RandomState(4)
    sample = rs.randn(2, 16, 7).astype(np.float32) * 0.3
    eps = rs.randn(2, 16, 7).astype(np.float32) * 0.1

    for t_int in [84, 12, 0]:
        prev_t = t_int - 100 // 8
        out = sch.step(
            jnp.asarray(eps), jnp.asarray(t_int), jnp.asarray(prev_t),
            jnp.asarray(sample),
        )
        a_t = acp[t_int]
        a_prev = acp[prev_t] if prev_t >= 0 else 1.0
        b_t = 1 - a_t
        x0 = np.clip((sample - np.sqrt(b_t) * eps) / np.sqrt(a_t), -1, 1)
        # eta=0: deterministic, unclipped epsilon in the direction term
        prev = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(np.asarray(out), prev, rtol=2e-4, atol=2e-5)


def test_ddim_full_loop_denoises_to_clean_signal():
    """An oracle epsilon-model must take pure noise to the clean target
    through the 8-step DDIM chain."""
    sch = DDIMScheduler.create()
    target = np.full((1, 16, 7), 0.3, dtype=np.float32)
    acp = np.asarray(sch.alphas_cumprod)

    x = np.random.RandomState(5).randn(1, 16, 7).astype(np.float32)
    for t_int in leading_timesteps(100, 8):
        # oracle: eps consistent with x0 = target
        eps = (x - np.sqrt(acp[t_int]) * target) / np.sqrt(1 - acp[t_int])
        x = np.asarray(
            sch.step(
                jnp.asarray(eps), jnp.asarray(int(t_int)),
                jnp.asarray(int(t_int) - 12), jnp.asarray(x),
            )
        )
    np.testing.assert_allclose(x, target, atol=1e-3)


def test_schedulers_are_jittable_pytrees():
    sch = DDPMScheduler.create()

    @jax.jit
    def f(s, x, noise, t):
        return s.add_noise(x, noise, t)

    out = f(sch, jnp.ones((2, 4, 7)), jnp.zeros((2, 4, 7)), jnp.array([1, 2]))
    assert out.shape == (2, 4, 7)
