"""Golden-value tests for noise schedules and derived tables.

References checked against independent float64 closed forms (and torch where
it adds coverage) rather than against the reference repo's code.
"""

import math

import numpy as np
import pytest

from v2a_tpu.ops.schedules import (
    DiffusionSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    sigmoid_beta_schedule,
    squaredcos_cap_v2_beta_schedule,
)


def test_linear_schedule_endpoints():
    T = 100
    betas = linear_beta_schedule(T)
    scale = 1000 / T
    assert betas.shape == (T,)
    assert betas[0] == pytest.approx(scale * 1e-4)
    assert betas[-1] == pytest.approx(scale * 0.02)
    assert np.all(np.diff(betas) > 0)


def test_cosine_schedule_closed_form():
    T, s = 100, 0.008
    betas = cosine_beta_schedule(T)
    # independently recompute alpha_bar ratios
    t = np.arange(T + 1, dtype=np.float64) / T
    ab = np.cos((t + s) / (1 + s) * math.pi / 2) ** 2
    ab = ab / ab[0]
    expected = np.clip(1 - ab[1:] / ab[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, expected, rtol=1e-12)
    assert betas.max() <= 0.999


def test_cosine_equals_squaredcos_cap_v2():
    # The lucidrains cosine schedule and diffusers' squaredcos_cap_v2 are the
    # same curve; both families must agree on it.
    for T in (10, 100, 1000):
        np.testing.assert_allclose(
            cosine_beta_schedule(T),
            squaredcos_cap_v2_beta_schedule(T),
            rtol=1e-9,
            atol=1e-12,
        )


def test_cosine_matches_torch_float64():
    torch = pytest.importorskip("torch")
    T = 100
    steps = T + 1
    t = torch.linspace(0, T, steps, dtype=torch.float64) / T
    ac = torch.cos((t + 0.008) / 1.008 * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999)
    np.testing.assert_allclose(
        cosine_beta_schedule(T), betas.numpy(), rtol=1e-10, atol=1e-14
    )


def test_sigmoid_schedule_monotone_alphabar():
    betas = sigmoid_beta_schedule(50)
    ab = np.cumprod(1 - betas)
    assert np.all(np.diff(ab) < 0)
    assert betas.min() >= 0 and betas.max() <= 0.999


def test_schedule_tables_consistency():
    sched = DiffusionSchedule.create(100, "cosine")
    betas = np.asarray(sched.betas, dtype=np.float64)
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(sched.alphas_cumprod, acp, rtol=5e-5)
    np.testing.assert_allclose(
        sched.alphas_cumprod_prev[1:], sched.alphas_cumprod[:-1], rtol=0
    )
    assert sched.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(
        sched.sqrt_alphas_cumprod**2 + sched.sqrt_one_minus_alphas_cumprod**2,
        1.0,
        atol=1e-6,
    )
    # posterior mean coefficients: recompute directly from the closed forms
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    np.testing.assert_allclose(
        sched.posterior_mean_coef1,
        betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef2,
        (1 - acp_prev) * np.sqrt(1 - betas) / (1 - acp),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        sched.posterior_variance, betas * (1 - acp_prev) / (1 - acp), rtol=2e-4
    )
    # SNR identity
    np.testing.assert_allclose(
        sched.snr, sched.alphas_cumprod / (1 - sched.alphas_cumprod), rtol=1e-4
    )


def test_min_snr_loss_weights():
    sched = DiffusionSchedule.create(100, "cosine")
    w_v = np.asarray(sched.loss_weight("pred_v", True, 5.0))
    snr = np.asarray(sched.snr)
    np.testing.assert_allclose(w_v, np.minimum(snr, 5.0) / (snr + 1), rtol=1e-6)
    w_eps = np.asarray(sched.loss_weight("pred_noise", True, 5.0))
    np.testing.assert_allclose(w_eps, np.minimum(snr, 5.0) / snr, rtol=1e-6)
    # without min-snr, pred_noise weights are exactly 1
    np.testing.assert_allclose(
        sched.loss_weight("pred_noise", False), np.ones(100), rtol=1e-6
    )


def test_schedule_is_pytree():
    import jax

    # T=100 keeps the rescaled linear betas < 1 (at T=10 beta_end=2.0 and
    # the schedule is NaN by design — reference parity with the unclipped
    # goal_diffusion.py:308-315 linear schedule)
    sched = DiffusionSchedule.create(100, "linear")
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 12
    # static field survives tree_map
    mapped = jax.tree_util.tree_map(lambda x: x * 1.0, sched)
    assert mapped.num_timesteps == 100
