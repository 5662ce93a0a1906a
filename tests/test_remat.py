"""Gradient checkpointing (`use_checkpoint` -> block-level `jax.remat`).

The reference ships a custom-autograd `checkpoint`
(`flowdiffusion/flowdiffusion/guided_diffusion/guided_diffusion/nn.py:192-236`)
wired per ResBlock/attention block (`.../guided_diffusion/unet.py:160,174,184`)
and exposed as the `use_checkpoint` CLI flag (`.../script_util.py:58,93`).
These tests pin the TPU-native counterpart: remat-on and remat-off variants
share one parameter tree, produce identical outputs, and produce identical
gradients — remat only changes WHEN activations are (re)computed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.models.image_unet import EncoderUNet, ImageUNet
from v2a_tpu.models.video_unet import VideoUNet
from v2a_tpu.models.video_unet_xattn import VideoUNetXAttn


def _tree_max_diff(a, b):
    return max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda x, y: float(jnp.abs(x - y).max()), a, b
            )
        )
    )


def _assert_grads_close(a, b):
    """Remat changes only recomputation order; gradients agree up to f32
    reassociation noise (XLA fuses the rematerialized forward differently)."""
    def chk(x, y):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-4
        )
    jax.tree_util.tree_map(chk, a, b)


def _assert_remat_in_grad_jaxpr(loss_fn, params):
    jaxpr = str(jax.make_jaxpr(jax.grad(loss_fn))(params))
    assert "remat" in jaxpr or "checkpoint" in jaxpr


def test_video_unet_remat_grads_match():
    kw = dict(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, task_token_dim=16, fused=False,
    )
    base = VideoUNet(**kw)
    ckpt = VideoUNet(**kw, use_checkpoint=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 3, 8, 8, 6), jnp.float32)
    t = jnp.asarray([1, 7])
    tok = jnp.asarray(rs.randn(2, 5, 16), jnp.float32)

    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    params_ckpt = ckpt.init(jax.random.PRNGKey(0), x, t, tok)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_ckpt
    )
    assert _tree_max_diff(params, params_ckpt) == 0.0

    def loss(fn):
        return lambda p: jnp.sum(fn.apply(p, x, t, tok) ** 2)

    out_diff = float(
        jnp.abs(base.apply(params, x, t, tok) - ckpt.apply(params, x, t, tok)).max()
    )
    assert out_diff == 0.0
    g0 = jax.grad(loss(base))(params)
    g1 = jax.grad(loss(ckpt))(params)
    _assert_grads_close(g0, g1)
    _assert_remat_in_grad_jaxpr(loss(ckpt), params)


def test_video_unet_level_remat_grads_match():
    """remat_policy="levels": the module tags level transitions with
    `checkpoint_name("v2a_level")`; wrapped in a
    save_only_these_names("v2a_level") jax.checkpoint (as the trainer
    does), outputs and gradients match the plain model exactly/closely."""
    kw = dict(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, task_token_dim=16, fused=False,
    )
    base = VideoUNet(**kw)
    lvl = VideoUNet(**kw, use_checkpoint=True, remat_policy="levels")
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 3, 8, 8, 6), jnp.float32)
    t = jnp.asarray([1, 7])
    tok = jnp.asarray(rs.randn(2, 5, 16), jnp.float32)

    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    params_lvl = lvl.init(jax.random.PRNGKey(0), x, t, tok)
    assert _tree_max_diff(params, params_lvl) == 0.0

    wrapped = jax.checkpoint(
        lambda p, xx, tt, ee: lvl.apply(p, xx, tt, ee),
        policy=jax.checkpoint_policies.save_only_these_names("v2a_level"),
    )
    out_diff = float(
        jnp.abs(base.apply(params, x, t, tok) - wrapped(params, x, t, tok))
        .max()
    )
    # policy-based checkpointing regroups XLA fusions, so the forward is
    # only float-close (block remat, by contrast, is bitwise — see above)
    assert out_diff < 1e-5

    g0 = jax.grad(lambda p: jnp.sum(base.apply(p, x, t, tok) ** 2))(params)
    loss_lvl = lambda p: jnp.sum(wrapped(p, x, t, tok) ** 2)  # noqa: E731
    g1 = jax.grad(loss_lvl)(params)
    _assert_grads_close(g0, g1)
    jaxpr = str(jax.make_jaxpr(jax.grad(loss_lvl))(params))
    assert "v2a_level" in jaxpr and ("remat" in jaxpr or "checkpoint" in jaxpr)


def test_video_unet_mxu_remat_grads_match():
    """remat_policy="mxu" (round 5): save only conv/dot outputs, recompute
    the VPU chains (GroupNorm/SiLU/softmax) in backward. The module stays
    plain; only the trainer-side jax.checkpoint wrapper differs."""
    kw = dict(
        in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, task_token_dim=16, fused=False,
    )
    base = VideoUNet(**kw)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, 3, 8, 8, 6), jnp.float32)
    t = jnp.asarray([1, 7])
    tok = jnp.asarray(rs.randn(2, 5, 16), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)

    wrapped = jax.checkpoint(
        lambda p, xx, tt, ee: base.apply(p, xx, tt, ee),
        policy=lambda prim, *_, **__: prim.name in (
            "conv_general_dilated", "dot_general"),
    )
    out_diff = float(
        jnp.abs(base.apply(params, x, t, tok) - wrapped(params, x, t, tok))
        .max()
    )
    assert out_diff < 1e-5
    g0 = jax.grad(lambda p: jnp.sum(base.apply(p, x, t, tok) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(wrapped(p, x, t, tok) ** 2))(params)
    _assert_grads_close(g0, g1)


def test_image_unet_remat_grads_match():
    kw = dict(
        in_channels=3, model_channels=8, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=4,
    )
    base = ImageUNet(**kw)
    ckpt = ImageUNet(**kw, use_checkpoint=True)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 3), jnp.float32)
    t = jnp.asarray([0, 9])
    params = base.init(jax.random.PRNGKey(0), x, t)
    params_ckpt = ckpt.init(jax.random.PRNGKey(0), x, t)
    assert _tree_max_diff(params, params_ckpt) == 0.0

    def loss(fn):
        return lambda p: jnp.sum(fn.apply(p, x, t) ** 2)

    g0 = jax.grad(loss(base))(params)
    g1 = jax.grad(loss(ckpt))(params)
    _assert_grads_close(g0, g1)
    _assert_remat_in_grad_jaxpr(loss(ckpt), params)


def test_encoder_unet_remat_grads_match():
    kw = dict(
        in_channels=3, model_channels=8, out_channels=10, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=4,
        pool="attention",
    )
    base = EncoderUNet(**kw)
    ckpt = EncoderUNet(**kw, use_checkpoint=True)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 3), jnp.float32)
    t = jnp.asarray([3, 4])
    params = base.init(jax.random.PRNGKey(0), x, t)
    assert _tree_max_diff(params, ckpt.init(jax.random.PRNGKey(0), x, t)) == 0.0

    def loss(fn):
        return lambda p: jnp.sum(fn.apply(p, x, t) ** 2)

    g0 = jax.grad(loss(base))(params)
    g1 = jax.grad(loss(ckpt))(params)
    _assert_grads_close(g0, g1)


def test_video_unet_xattn_remat_grads_match():
    kw = dict(
        in_channels=6, out_channels=3, block_out_channels=(32, 64),
        layers_per_block=1, attn_heads=2, context_dim=16,
    )
    base = VideoUNetXAttn(**kw)
    ckpt = VideoUNetXAttn(**kw, use_checkpoint=True)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 2, 8, 8, 6), jnp.float32)
    t = jnp.asarray([5])
    tok = jnp.asarray(rs.randn(1, 4, 16), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x, t, tok)
    assert (
        _tree_max_diff(params, ckpt.init(jax.random.PRNGKey(0), x, t, tok))
        == 0.0
    )

    def loss(fn):
        return lambda p: jnp.sum(fn.apply(p, x, t, tok) ** 2)

    g0 = jax.grad(loss(base))(params)
    g1 = jax.grad(loss(ckpt))(params)
    _assert_grads_close(g0, g1)
    _assert_remat_in_grad_jaxpr(loss(ckpt), params)


def test_guided_flag_threads_to_model():
    """`--use_checkpoint True` flows from the CLI defaults through
    `create_model_and_diffusion` into the Flax module."""
    from v2a_tpu.guided.script_util import (
        args_subset,
        create_model_and_diffusion,
        model_and_diffusion_defaults,
        parser_from_defaults,
    )

    defaults = model_and_diffusion_defaults()
    assert "use_checkpoint" in defaults and defaults["use_checkpoint"] is False
    parser = parser_from_defaults(defaults)
    args = parser.parse_args(
        ["--use_checkpoint", "True", "--image_size", "16",
         "--num_channels", "8", "--attention_resolutions", "8"]
    )
    model, _ = create_model_and_diffusion(
        **args_subset(args, model_and_diffusion_defaults().keys())
    )
    assert model.use_checkpoint is True


def test_video_trainer_use_checkpoint_step_matches(tmp_path):
    """The VideoTrainerConfig knob wires a remat'd (non-fused) U-Net into
    the train step, and one step applies a same-scale update. Exact
    post-Adam param equality is NOT asserted: where a gradient is ~0 the
    first Adam update is sign-normalized (g/sqrt(g^2)+eps at magnitude lr),
    so remat's f32 reassociation noise can legitimately move a few leaves
    by O(lr). Gradient-level equality is pinned by
    test_video_unet_remat_grads_match above."""
    import h5py

    from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel
    from v2a_tpu.train.video_trainer import (
        VideoClipDataset,
        VideoModelTrainer,
        VideoTrainerConfig,
    )

    h5path = str(tmp_path / "clips.h5")
    rs = np.random.RandomState(0)
    with h5py.File(h5path, "w") as f:
        g = f.create_group("push the button").create_group("0")
        g.create_dataset(
            "agentview_image",
            data=rs.randint(0, 255, size=(30, 8, 8, 3), dtype=np.uint8),
        )

    cfg = VideoModelConfig(
        image_size=(8, 8), sample_per_seq=3, timesteps=10,
        sampling_timesteps=2, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_resolutions=(2,), num_head_channels=16,
        text_dim=16, fused=False,
    )

    params_after = []
    for use_ckpt, policy in (
        (False, "blocks"), (True, "blocks"), (True, "levels"),
    ):
        model = VideoPredModel(cfg)
        ds = VideoClipDataset(h5path, ["push the button"], frames=2, stride=4)
        tr = VideoModelTrainer(
            model, ds,
            VideoTrainerConfig(batch_size=2, n_train_steps=1,
                               save_freq=10**9, log_freq=10**9,
                               use_checkpoint=use_ckpt,
                               remat_policy=policy),
            workdir=str(tmp_path / f"w{use_ckpt}-{policy}"), seed=0,
        )
        assert tr.train_unet.use_checkpoint is use_ckpt
        assert tr.train_unet.fused is False
        if use_ckpt and policy == "levels":
            assert tr.train_unet.remat_policy == "levels"
            # the level wrapper is a jax.checkpoint-wrapped callable
            # (functools.wraps sets __wrapped__), not the bare lambda
            assert hasattr(tr._train_apply, "__wrapped__")
        tr.train(1)
        params_after.append(tr.state.params)
        for leaf in jax.tree_util.tree_leaves(tr.state.params):
            assert np.isfinite(np.asarray(leaf)).all()

    # same-scale update (first Adam step magnitude = lr = 1e-4); exact
    # equality is not stable post-Adam — see docstring
    assert _tree_max_diff(params_after[0], params_after[1]) < 2e-4
    assert _tree_max_diff(params_after[0], params_after[2]) < 2e-4
