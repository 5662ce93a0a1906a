"""Grad-equality tests for the differentiable fused conv
(`v2a_tpu/ops/conv_vjp.py`) against the plain-XLA composite.

The forward is the Pallas `fused_affine_conv3x3` (interpret mode on CPU);
values and gradients must match the plain formulation the training path
uses today, for both the XLA-bwd and the Pallas-dgrad backward variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2a_tpu.ops.conv_vjp import (
    affine_silu_conv3x3,
    affine_silu_conv3x3_reference,
)


def _problem(seed=0, n=4, h=8, w=8, c=128, d=128):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, c, d), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (d,), jnp.float32) * 0.1
    a = 1.0 + 0.3 * jax.random.normal(ks[3], (n, c), jnp.float32)
    b = 0.2 * jax.random.normal(ks[4], (n, c), jnp.float32)
    return x, kernel, bias, a, b


@pytest.mark.parametrize("dgrad_pallas", [False, True])
@pytest.mark.parametrize("hw", [(8, 8), (16, 16), (32, 24)])
def test_fused_conv_vjp_matches_reference(dgrad_pallas, hw):
    h, w = hw
    x, kernel, bias, a, b = _problem(h=h, w=w)

    def loss_fused(args):
        y = affine_silu_conv3x3(
            *args, dgrad_pallas=dgrad_pallas, interpret=True
        )
        return jnp.sum(jnp.sin(y))

    def loss_ref(args):
        return jnp.sum(jnp.sin(affine_silu_conv3x3_reference(*args)))

    args = (x, kernel, bias, a, b)
    v0, g0 = jax.value_and_grad(loss_ref)(args)
    v1, g1 = jax.value_and_grad(loss_fused)(args)
    np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=2e-5)
    for name, t0, t1 in zip(
        ("dx", "dkernel", "dbias", "da", "db"), g0, g1
    ):
        np.testing.assert_allclose(
            np.asarray(t0), np.asarray(t1), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_fused_conv_vjp_bf16_dtypes():
    """bf16 activations / f32 params: cotangent dtypes must match primals."""
    x, kernel, bias, a, b = _problem(h=8, w=8)
    x = x.astype(jnp.bfloat16)

    def loss(args):
        y = affine_silu_conv3x3(*args, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)((x, kernel, bias, a, b))
    assert grads[0].dtype == jnp.bfloat16
    assert grads[1].dtype == jnp.float32
    assert all(g.dtype == jnp.float32 for g in grads[2:])
    ref = jax.grad(
        lambda ar: jnp.sum(
            affine_silu_conv3x3_reference(
                *ar, compute_dtype=jnp.bfloat16
            ).astype(jnp.float32) ** 2
        )
    )((x, kernel, bias, a, b))
    # bf16 forward: grads agree to bf16-class tolerance (the exactness
    # claim lives in the f32 tests above; wgrad here is two different
    # bf16-rounded summation orders, so allow scale-aware slack)
    for t0, t1 in zip(ref, grads):
        t0 = np.asarray(t0, np.float32)
        t1 = np.asarray(t1, np.float32)
        tol = 0.15 + 0.02 * np.abs(t0).max()
        np.testing.assert_allclose(t0, t1, rtol=0.1, atol=tol)


def test_video_unet_train_fused_grads_match():
    """Full-model gate: VideoUNet(train_fused=True) must produce the same
    loss and parameter gradients as the plain path (identical param tree),
    with both ResBlock conv halves routed through the custom_vjp kernel."""
    from v2a_tpu.models.video_unet import VideoUNet

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3,
        num_res_blocks=1, attention_resolutions=(),
        channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64, dtype=jnp.float32, fused=False,
    )
    plain = VideoUNet(**kw)
    tfused = VideoUNet(**kw, train_fused=True)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 2, 16, 16, 6), jnp.float32)
    t = jnp.array([3], jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64), jnp.float32)
    params = plain.init(jax.random.PRNGKey(2), x, t, emb)

    def loss(model):
        def f(p):
            y = model.apply(p, x, t, emb)
            return jnp.mean(y ** 2)
        return f

    v0, g0 = jax.value_and_grad(loss(plain))(params)
    v1, g1 = jax.value_and_grad(loss(tfused))(params)
    np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    assert len(flat0) == len(flat1)
    for (p0, t0), (p1, t1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(t0), np.asarray(t1), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(p0),
        )


def test_tconv_dot_grads_match(monkeypatch):
    """The tap-dot temporal conv (PERF_TRAIN_TCONV_DOT) must produce the
    same loss and gradients as the transpose+conv1d form on the identical
    param tree."""
    import v2a_tpu.models.video_unet as vu

    kw = dict(
        in_channels=6, model_channels=128, out_channels=3,
        num_res_blocks=1, attention_resolutions=(),
        channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=64, dtype=jnp.float32, fused=False,
        train_fused=True,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 3, 16, 16, 6), jnp.float32)
    t = jnp.array([3], jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64), jnp.float32)
    model = vu.VideoUNet(**kw)
    params = model.init(jax.random.PRNGKey(2), x, t, emb)

    def f(p):
        return jnp.mean(model.apply(p, x, t, emb) ** 2)

    monkeypatch.setattr(vu, "PERF_TRAIN_TCONV_DOT", False)
    v0, g0 = jax.value_and_grad(f)(params)
    monkeypatch.setattr(vu, "PERF_TRAIN_TCONV_DOT", True)
    v1, g1 = jax.value_and_grad(f)(params)
    np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=1e-7)
    for (p0, t0), (_, t1) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(
            np.asarray(t0), np.asarray(t1), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(p0),
        )


@pytest.mark.parametrize("has_affine", [False, True])
@pytest.mark.parametrize("hw", [(8, 8), (16, 16)])
def test_wgrad_pallas_matches_reference(has_affine, hw):
    """The Pallas band-accumulation wgrad (`wgrad_conv3x3`) routed through
    both custom_vjp variants must reproduce XLA's kernel gradient."""
    from v2a_tpu.ops.conv_vjp import plain_conv3x3

    h, w = hw
    x, kernel, bias, a, b = _problem(h=h, w=w)

    if has_affine:
        def loss_fused(args):
            y = affine_silu_conv3x3(
                *args, interpret=True, wgrad_pallas=True
            )
            return jnp.sum(jnp.sin(y))

        def loss_ref(args):
            return jnp.sum(jnp.sin(affine_silu_conv3x3_reference(*args)))

        args = (x, kernel, bias, a, b)
        names = ("dx", "dkernel", "dbias", "da", "db")
    else:
        def loss_fused(args):
            y = plain_conv3x3(*args, interpret=True, wgrad_pallas=True)
            return jnp.sum(jnp.sin(y))

        def loss_ref(args):
            x_, k_, b_ = args
            y = jax.lax.conv_general_dilated(
                x_, k_, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b_
            return jnp.sum(jnp.sin(y))

        args = (x, kernel, bias)
        names = ("dx", "dkernel", "dbias")

    v0, g0 = jax.value_and_grad(loss_ref)(args)
    v1, g1 = jax.value_and_grad(loss_fused)(args)
    np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=2e-5)
    for name, t0, t1 in zip(names, g0, g1):
        np.testing.assert_allclose(
            np.asarray(t0), np.asarray(t1), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("dgrad_pallas", [False, True])
def test_plain_conv_vjp_matches_reference(dgrad_pallas):
    """No-affine variant (the Upsample3D conv routing)."""
    from v2a_tpu.ops.conv_vjp import plain_conv3x3

    x, kernel, bias, _, _ = _problem(h=16, w=16)

    def loss_fused(args):
        y = plain_conv3x3(*args, dgrad_pallas=dgrad_pallas, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(args):
        x_, k_, b_ = args
        y = jax.lax.conv_general_dilated(
            x_, k_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_
        return jnp.sum(jnp.sin(y))

    args = (x, kernel, bias)
    v0, g0 = jax.value_and_grad(loss_ref)(args)
    v1, g1 = jax.value_and_grad(loss_fused)(args)
    np.testing.assert_allclose(v0, v1, rtol=2e-5, atol=2e-5)
    for name, t0, t1 in zip(("dx", "dkernel", "dbias"), g0, g1):
        np.testing.assert_allclose(
            np.asarray(t0), np.asarray(t1), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )
