"""Parity tests for the fused clip+AdamW optimizer (train_state.py).

The fused transform must be numerically identical to the optax chain it
replaced (`optax.chain(clip_by_global_norm, adamw)`) when gradients are
float32, and must stay a faithful (bf16-rounded) trainer when gradients
are stored in bfloat16 — the TPU analog of the reference's fp16-autocast
gradients (`lb_online_trainer_v7.py:72-76,593-608`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from v2a_tpu.train.train_state import (
    EMAConfig,
    OptimizerConfig,
    TrainState,
    fused_clip_adamw,
    global_grad_norm,
    make_train_step,
)


def _reference_tx(cfg: OptimizerConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            cfg.lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )


def _random_tree(key, scale=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dense": {"kernel": jax.random.normal(k1, (16, 8)) * scale,
                  "bias": jax.random.normal(k2, (8,)) * scale},
        "conv": jax.random.normal(k3, (3, 3, 4, 4)) * scale,
    }


@pytest.mark.parametrize("grad_scale", [0.01, 10.0])  # below/above the clip
def test_fused_matches_optax_chain(grad_scale):
    cfg = OptimizerConfig()
    fused = fused_clip_adamw(cfg)
    ref = _reference_tx(cfg)

    params = _random_tree(jax.random.PRNGKey(0))
    fs, rs = fused.init(params), ref.init(params)
    p_f = p_r = params
    for step in range(5):
        grads = _random_tree(jax.random.PRNGKey(100 + step), grad_scale)
        uf, fs = fused.update(grads, fs, p_f)
        ur, rs = ref.update(grads, rs, p_r)
        p_f = optax.apply_updates(p_f, uf)
        p_r = optax.apply_updates(p_r, ur)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7),
            p_f, p_r,
        )


def test_global_grad_norm_f32_accumulation():
    g = {"a": jnp.full((1000,), 0.1, jnp.bfloat16)}
    norm = global_grad_norm(g)
    assert norm.dtype == jnp.float32
    np.testing.assert_allclose(
        float(norm), float(np.sqrt(1000 * np.float32(jnp.bfloat16(0.1)) ** 2)),
        rtol=1e-5,
    )


def test_bf16_grad_storage_trains_like_f32(monkeypatch):
    """A short quadratic-loss training run with bf16-stored gradients must
    track the f32-gradient trajectory closely (the optimizer arithmetic is
    f32 either way; only the gradient leaves are rounded)."""
    import v2a_tpu.train.train_state as ts

    def loss_fn(params, rng, batch):
        pred = batch @ params["w"] + params["b"]
        return jnp.mean((pred - 1.0) ** 2)

    batch = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    params = {"w": jnp.zeros((8,)), "b": jnp.zeros(())}

    trajectories = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        monkeypatch.setattr(ts, "GRAD_DTYPE", jnp.dtype(dtype))
        tx = ts.make_optimizer(OptimizerConfig(lr=1e-2))
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(loss_fn, tx, EMAConfig()))
        losses = []
        for i in range(30):
            state, loss, _ = step(state, jax.random.PRNGKey(i), batch)
            losses.append(float(loss))
        trajectories[np.dtype(dtype).name] = (losses, state)

    l32, s32 = trajectories["float32"]
    l16, s16 = trajectories["bfloat16"]
    assert l16[-1] < l16[0] * 0.5  # it actually trains
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0.02, atol=1e-3),
        s16.params, s32.params,
    )


def test_bf16_moment_storage_trains_like_f32(monkeypatch):
    """V2A_MOMENT_DTYPE=bfloat16 stores the Adam moments (m, v) in bf16 —
    halving the dominant HBM traffic of the optimizer pass (4 of the 9
    parameter-sized passes, PERF.md round-4 table) — while keeping every
    update arithmetic op in f32. A short quadratic run must track the f32
    trajectory closely, and the state leaves must actually be bf16."""
    import v2a_tpu.train.train_state as ts

    def loss_fn(params, rng, batch):
        pred = batch @ params["w"] + params["b"]
        return jnp.mean((pred - 1.0) ** 2)

    batch = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    params = {"w": jnp.zeros((8,)), "b": jnp.zeros(())}

    trajectories = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        monkeypatch.setattr(ts, "MOMENT_DTYPE", jnp.dtype(dtype))
        tx = ts.make_optimizer(OptimizerConfig(lr=1e-2))
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(loss_fn, tx, EMAConfig()))
        losses = []
        for i in range(30):
            state, loss, _ = step(state, jax.random.PRNGKey(i), batch)
            losses.append(float(loss))
        trajectories[np.dtype(dtype).name] = (losses, state)

    l32, s32 = trajectories["float32"]
    l16, s16 = trajectories["bfloat16"]
    adam16 = s16.opt_state
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree_util.tree_leaves((adam16.mu, adam16.nu))
    )
    assert l16[-1] < l16[0] * 0.5  # it actually trains
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0.02, atol=1e-3),
        s16.params, s32.params,
    )


def test_moment_dtype_config_field():
    """OptimizerConfig.moment_dtype is the first-class API for the moment
    storage dtype (V2A_MOMENT_DTYPE env is the fallback)."""
    cfg = OptimizerConfig(moment_dtype="bfloat16")
    tx = fused_clip_adamw(cfg)
    params = {"w": jnp.ones((8,))}
    state = tx.init(params)
    assert state.mu["w"].dtype == jnp.bfloat16
    updates, state = tx.update({"w": jnp.full((8,), 0.1)}, state, params)
    assert updates["w"].dtype == jnp.float32  # applied in param dtype
    assert state.nu["w"].dtype == jnp.bfloat16


def test_accumulate_path_uses_storage_dtype(monkeypatch):
    import v2a_tpu.train.train_state as ts

    monkeypatch.setattr(ts, "GRAD_DTYPE", jnp.dtype(jnp.bfloat16))

    def loss_fn(params, rng, batch):
        return jnp.sum((params["w"] - batch) ** 2)

    tx = ts.make_optimizer(OptimizerConfig(lr=1e-2))
    params = {"w": jnp.ones((4,))}
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(loss_fn, tx, EMAConfig(), accumulate=2))
    batch = jnp.zeros((2, 4))  # leading accumulate axis
    state, loss, gn = step(state, jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(loss)) and np.isfinite(float(gn))
    assert (np.asarray(state.params["w"]) != 1.0).all()


def test_weight_precast_matches_cast_at_use(monkeypatch):
    """V2A_WCAST=1 pre-casts >=2D f32 leaves to bf16 ONCE behind an
    optimization_barrier instead of letting XLA fuse the cast into every
    consumer (a VMEM-prefetch bandwidth experiment, PERF.md round 3). For
    a loss whose compute dtype is bf16 the two programs are numerically
    IDENTICAL: cast(cast(p)) == cast(p). 1D leaves (biases, norm scales)
    must stay f32. Gradients must flow through the barrier."""
    import v2a_tpu.train.train_state as ts

    def loss_fn(params, rng, batch):
        # bf16 compute path: kernel cast at use (like flax dtype=bf16);
        # the 1D bias is consumed in f32 (like a norm scale)
        w = params["w"].astype(jnp.bfloat16)
        pred = (batch.astype(jnp.bfloat16) @ w).astype(jnp.float32)
        pred = pred + params["b"]
        return jnp.mean((pred - 1.0) ** 2)

    batch = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    params = {
        "w": jax.random.normal(jax.random.PRNGKey(1), (8, 4)),
        "b": jnp.full((4,), 1e-4),  # small f32 value a bf16 cast would round
    }

    results = {}
    for precast in (False, True):
        monkeypatch.setattr(ts, "WEIGHT_PRECAST", precast)
        tx = ts.make_optimizer(OptimizerConfig(lr=1e-2))
        state = TrainState.create(params, tx)
        step = jax.jit(ts.make_train_step(loss_fn, tx, EMAConfig()))
        for i in range(3):
            state, loss, gn = step(state, jax.random.PRNGKey(i), batch)
        results[precast] = (state, float(loss), float(gn))

    (s0, l0, g0), (s1, l1, g1) = results[False], results[True]
    assert np.isfinite(l1) and g1 > 0.0  # grads flowed through the barrier
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        ),
        s1.params, s0.params,
    )
