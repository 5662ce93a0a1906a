"""Equivalence of the argmax-packed max pool (ops/pool.py) with the
reference lowering (flax max_pool -> reduce_window / select-and-scatter):
bit-exact forward, identical gradient routing including first-max ties.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from v2a_tpu.ops.pool import max_pool_3x3s2


def _ref_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("hw", [(8, 8), (16, 12), (64, 64)])
def test_forward_bit_exact(hw):
    h, w = hw
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, 8)).astype(
        jnp.bfloat16
    )
    got = max_pool_3x3s2(x)
    want = _ref_pool(x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_backward_matches_select_and_scatter():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4)).astype(
        jnp.bfloat16
    )
    co = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4)).astype(
        jnp.bfloat16
    )

    def loss_packed(x):
        return jnp.sum(max_pool_3x3s2(x).astype(jnp.float32) * co.astype(jnp.float32))

    def loss_ref(x):
        return jnp.sum(_ref_pool(x).astype(jnp.float32) * co.astype(jnp.float32))

    gp = np.asarray(jax.grad(loss_packed)(x), np.float32)
    gr = np.asarray(jax.grad(loss_ref)(x), np.float32)
    # identical routing (same support) ...
    np.testing.assert_array_equal(gp != 0, gr != 0)
    # ... and identical values up to accumulation precision: positions that
    # are the argmax of SEVERAL windows sum their dy contributions in f32
    # here but in bf16 in select-and-scatter-add, so allow bf16 rounding.
    np.testing.assert_allclose(gp, gr, rtol=2e-2, atol=1e-6)


def test_backward_tie_routing_first_max():
    """Constant plateaus: every window is all-ties; the gradient must go to
    the first (row-major) position of each window, exactly as
    select-and-scatter routes it."""
    x = jnp.ones((1, 8, 8, 1), jnp.bfloat16)
    co = jnp.ones((1, 4, 4, 1), jnp.bfloat16)
    gp = jax.grad(
        lambda x: jnp.sum(max_pool_3x3s2(x).astype(jnp.float32) * co.astype(jnp.float32))
    )(x)
    gr = jax.grad(
        lambda x: jnp.sum(_ref_pool(x).astype(jnp.float32) * co.astype(jnp.float32))
    )(x)
    np.testing.assert_array_equal(np.asarray(gp, np.float32), np.asarray(gr, np.float32))


def test_negative_zero_and_extremes():
    vals = np.array(
        [[-0.0, 0.0, -1e30, 1e30], [3.14, -3.14, 1e-30, -1e-30],
         [np.inf, -np.inf, 2.0, -2.0], [0.5, -0.5, 64.0, -64.0]],
        np.float32,
    )
    x = jnp.asarray(np.tile(vals[None, :, :, None], (1, 2, 2, 1))).astype(
        jnp.bfloat16
    )
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3s2(x), np.float32),
        np.asarray(_ref_pool(x), np.float32),
    )


def test_rejects_f32():
    with pytest.raises(ValueError):
        max_pool_3x3s2(jnp.ones((1, 8, 8, 1), jnp.float32))


def test_maskbwd_forward_matches_nn_max_pool():
    from flax import linen as nn

    from v2a_tpu.ops.pool import max_pool_3x3s2_maskbwd

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 16, 8), jnp.bfloat16)
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3s2_maskbwd(x)), np.asarray(ref)
    )


def test_maskbwd_gradient_matches_when_tie_free():
    """With all-distinct window values the all-ties backward equals the
    select-and-scatter backward exactly."""
    from flax import linen as nn

    from v2a_tpu.ops.pool import max_pool_3x3s2_maskbwd

    rs = np.random.RandomState(1)
    # distinct float32 values -> no ties even after bf16... keep f32 here
    x = jnp.asarray(
        rs.permutation(16 * 16 * 4).reshape(1, 16, 16, 4), jnp.float32
    )

    def loss_ref(x):
        y = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return jnp.sum(y * jnp.arange(y.size).reshape(y.shape))

    def loss_mask(x):
        y = max_pool_3x3s2_maskbwd(x)
        return jnp.sum(y * jnp.arange(y.size).reshape(y.shape))

    g_ref = jax.grad(loss_ref)(x)
    g_mask = jax.grad(loss_mask)(x)
    np.testing.assert_allclose(np.asarray(g_mask), np.asarray(g_ref))


def test_maskbwd_tie_routing_deviation_is_all_ties():
    """Pin the DOCUMENTED deviation: on a constant plateau the mask
    backward routes each window's gradient to every covered position."""
    from v2a_tpu.ops.pool import max_pool_3x3s2_maskbwd

    x = jnp.zeros((1, 4, 4, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(max_pool_3x3s2_maskbwd(x)))(x)
    # every input position is covered by >= 1 window and ties everywhere:
    # all entries receive gradient (select-and-scatter would pick one per
    # window)
    assert (np.asarray(g) > 0).all()
    # total gradient = sum over windows of (#tied positions x 1) > #windows
    assert float(np.asarray(g).sum()) > 4.0
