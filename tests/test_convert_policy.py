"""Policy-stack conversion: torch-oracle parity for ConditionalUnet1D and a
structural round trip for the full policy tree (the reference obs encoder
needs torchvision, absent here, so its state dict is synthesized with the
exact torch key names/shapes)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tests.test_convert import shim_module

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from v2a_tpu.convert.torch_import import (  # noqa: E402
    convert_policy,
    convert_unet1d,
    convtranspose1d_w,
)

REF_MODEL_DIR = "/root/reference/diffuser/diffusion_policy/model/"


def _load_reference_unet1d():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF_MODEL_DIR):
        pytest.skip("reference checkout not available")
    for name in (
        "diffuser", "diffuser.diffusion_policy", "diffuser.diffusion_policy.model",
    ):
        if name not in sys.modules:
            sys.modules[name] = shim_module(name, package=True)

    def load(name, fname):
        spec = importlib.util.spec_from_file_location(
            name, REF_MODEL_DIR + fname
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    load("diffuser.diffusion_policy.model.conv1d_components",
         "conv1d_components.py")
    load("diffuser.diffusion_policy.model.positional_embedding",
         "positional_embedding.py")
    cu = load("diffuser.diffusion_policy.model.conditional_unet1d",
              "conditional_unet1d.py")
    return torch, cu.ConditionalUnet1D


def test_unet1d_conversion_parity():
    torch, TorchUnet = _load_reference_unet1d()
    torch.manual_seed(0)
    down_dims = (64, 128, 256)
    tm = TorchUnet(
        input_dim=7, global_cond_dim=128, down_dims=list(down_dims),
        diffusion_step_embed_dim=32, kernel_size=5, n_groups=8,
        cond_predict_scale=True,
    ).eval()

    from v2a_tpu.models.unet1d import ConditionalUnet1D

    fm = ConditionalUnet1D(
        input_dim=7, down_dims=down_dims, diffusion_step_embed_dim=32,
        kernel_size=5, n_groups=8, cond_predict_scale=True,
    )
    params = {"params": convert_unet1d(tm.state_dict(), down_dims)}

    rs = np.random.RandomState(0)
    x = rs.randn(2, 16, 7).astype(np.float32)
    t = np.array([3, 9])
    cond = rs.randn(2, 128).astype(np.float32)

    with torch.no_grad():
        # the reference forward takes (B, T, C) and rearranges internally
        # (`conditional_unet1d.py:192-246`)
        out_t = tm(
            torch.tensor(x),
            torch.tensor(t, dtype=torch.long),
            global_cond=torch.tensor(cond),
        ).numpy()

    out_f = np.asarray(
        fm.apply(params, jnp.asarray(x), jnp.asarray(t, jnp.int32),
                 jnp.asarray(cond))
    )
    np.testing.assert_allclose(out_f, out_t, atol=1e-4, rtol=1e-3)


def test_convtranspose1d_transform_matches_torch():
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    torch.manual_seed(1)
    tconv = torch.nn.ConvTranspose1d(6, 5, kernel_size=4, stride=2, padding=1)
    x = np.random.RandomState(0).randn(2, 6, 10).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.tensor(x)).numpy()  # (2, 5, 20)

    fconv = nn.ConvTranspose(5, (4,), strides=(2,), padding=((2, 2),))
    params = {
        "params": {
            "kernel": jnp.asarray(convtranspose1d_w(tconv.weight)),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    out = np.asarray(fconv.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=1e-5)


# -- full policy tree structural round trip -------------------------------


def _synthetic_resnet_sd(rs, prefix):
    """torchvision resnet18 (BN->GN swapped) state dict shapes under the
    robomimic VisualCore nesting."""
    sd = {}

    def add(name, shape):
        sd[f"{prefix}.{name}"] = rs.randn(*shape).astype(np.float32) * 0.05

    add("nets.0.nets.0.weight", (64, 3, 7, 7))
    add("nets.0.nets.1.weight", (64,))
    add("nets.0.nets.1.bias", (64,))
    feats = {4: (64, 64), 5: (128, 64), 6: (256, 128), 7: (512, 256)}
    for idx, (f, f_in) in feats.items():
        for blk in (0, 1):
            cin = f_in if blk == 0 else f
            p = f"nets.0.nets.{idx}.{blk}"
            add(f"{p}.conv1.weight", (f, cin, 3, 3))
            add(f"{p}.bn1.weight", (f,))
            add(f"{p}.bn1.bias", (f,))
            add(f"{p}.conv2.weight", (f, f, 3, 3))
            add(f"{p}.bn2.weight", (f,))
            add(f"{p}.bn2.bias", (f,))
            if blk == 0 and idx > 4:
                add(f"{p}.downsample.0.weight", (f, cin, 1, 1))
                add(f"{p}.downsample.1.weight", (f,))
                add(f"{p}.downsample.1.bias", (f,))
    add("nets.1.nets.weight", (32, 512, 1, 1))
    add("nets.1.nets.bias", (32,))
    add("nets.3.weight", (64, 64))
    add("nets.3.bias", (64,))
    return sd


def test_policy_tree_round_trip_structure():
    """convert_policy output must be shape-identical to DiffusionPolicy.init
    so converted reference checkpoints load without surgery."""
    torch, TorchUnet = _load_reference_unet1d()
    from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig

    cfg = PolicyConfig(image_size=(64, 64), down_dims=(64, 128), horizon=16)
    torch.manual_seed(0)
    tm = TorchUnet(
        input_dim=7, global_cond_dim=cfg.global_cond_dim,
        down_dims=list(cfg.down_dims),
        diffusion_step_embed_dim=cfg.diffusion_step_embed_dim,
        kernel_size=cfg.kernel_size, n_groups=8, cond_predict_scale=True,
    )
    sd = {f"model.{k}": v for k, v in tm.state_dict().items()}
    rs = np.random.RandomState(0)
    for key in cfg.obs_keys:
        sd.update(_synthetic_resnet_sd(rs, f"obs_encoder.key_model_map.{key}"))

    converted = convert_policy(sd, obs_keys=cfg.obs_keys,
                               down_dims=cfg.down_dims)

    policy = DiffusionPolicy.create(cfg)
    init = policy.init(jax.random.PRNGKey(0))

    c_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    i_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(init)[0]
    }
    assert c_paths == i_paths

    # and the converted tree actually runs through loss + predict
    batch = {
        "obs": {
            k: jnp.zeros((1, 64, 64, 3)) for k in cfg.obs_keys
        },
        "action": jnp.zeros((1, 16, 7)),
    }
    loss = policy.loss(converted, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
