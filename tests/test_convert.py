"""Golden parity tests for torch -> JAX checkpoint conversion.

These tests build the REFERENCE torch models (imported from the read-only
reference checkout when present), convert their randomly-initialized state
dicts with `v2a_tpu.convert.torch_import`, and compare forward outputs on
identical inputs. They are skipped when the reference tree or torch is not
available (e.g. in a standalone deployment); the converter's layout
transforms are additionally covered by the reference-free tests at the
bottom.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from v2a_tpu.convert.torch_import import (  # noqa: E402
    conv1d_w,
    conv1x1_to_dense,
    conv2d_w,
    convert_clip_text,
    convert_video_unet,
    linear_w,
)

REF = "/root/reference/flowdiffusion/flowdiffusion"


def shim_module(name: str, package: bool = False) -> types.ModuleType:
    """A sys.modules shim with a REAL ModuleSpec. A bare types.ModuleType
    has __spec__=None, and importlib.util.find_spec raises ValueError on
    such modules — so a bare "torchvision" shim (installed for the
    reference import) poisons any later `import transformers` in the same
    pytest process (transformers probes optional deps via find_spec).
    Every shim the golden tests install must go through this helper."""
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=package)
    if package:
        m.__path__ = []
    return m


def _install_einops_exts_shim():
    """The reference imports `einops_exts`, absent here; shim the three
    helpers it uses with plain einops."""
    if "einops_exts" in sys.modules:
        return
    from einops import rearrange, repeat
    import torch.nn as nn

    mod = shim_module("einops_exts")
    mod.rearrange_many = lambda ts, *a, **k: [rearrange(t, *a, **k) for t in ts]
    mod.repeat_many = lambda ts, *a, **k: [repeat(t, *a, **k) for t in ts]
    mod.check_shape = lambda t, p, **k: rearrange(t, f"{p} -> {p}", **k)

    tmod = shim_module("einops_exts.torch")

    class EinopsToAndFrom(nn.Module):
        def __init__(self, from_pattern, to_pattern, fn):
            super().__init__()
            self.from_pattern, self.to_pattern, self.fn = (
                from_pattern, to_pattern, fn,
            )

        def forward(self, x, **kwargs):
            recon = dict(zip(self.from_pattern.split(), x.shape))
            x = rearrange(x, f"{self.from_pattern} -> {self.to_pattern}")
            x = self.fn(x, **kwargs)
            return rearrange(
                x, f"{self.to_pattern} -> {self.from_pattern}", **recon
            )

    tmod.EinopsToAndFrom = EinopsToAndFrom
    mod.torch = tmod
    sys.modules["einops_exts"] = mod
    sys.modules["einops_exts.torch"] = tmod


def _reference_unet():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    _install_einops_exts_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from guided_diffusion.guided_diffusion.unet import UNetModel

    return torch, UNetModel


SMALL = dict(
    model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(2,), num_head_channels=32,
)


@pytest.fixture(scope="module")
def torch_and_flax_unet():
    torch, UNetModel = _reference_unet()
    torch.manual_seed(0)
    # float32 end-to-end: the reference computes its timestep embedding in
    # float32 internally, so a double model raises dtype errors
    tm = UNetModel(
        image_size=(16, 16), in_channels=6, out_channels=3, dims=3,
        task_tokens=True, task_token_channels=64, **SMALL,
    ).eval()

    from v2a_tpu.models.video_unet import VideoUNet

    fm = VideoUNet(
        in_channels=6, out_channels=3, task_token_dim=64,
        model_channels=SMALL["model_channels"],
        num_res_blocks=SMALL["num_res_blocks"],
        channel_mult=SMALL["channel_mult"],
        attention_resolutions=SMALL["attention_resolutions"],
        num_head_channels=SMALL["num_head_channels"],
    )
    params = convert_video_unet(
        tm.state_dict(),
        channel_mult=SMALL["channel_mult"],
        num_res_blocks=SMALL["num_res_blocks"],
        attention_resolutions=SMALL["attention_resolutions"],
    )
    return torch, tm, fm, params


def test_video_unet_conversion_parity(torch_and_flax_unet):
    """The converted flax U-Net must match the torch forward bit-for-bit to
    float64 tolerance — this gates every use of the pretrained video
    checkpoint (SURVEY §7 'hard parts')."""
    torch, tm, fm, params = torch_and_flax_unet
    rs = np.random.RandomState(1)
    b, f, h, w = 2, 3, 16, 16
    x = rs.randn(b, 6, f, h, w).astype(np.float32)
    t = np.array([3, 7])
    tokens = rs.randn(b, 5, 64).astype(np.float32)

    with torch.no_grad():
        out_t = tm(
            torch.tensor(x), torch.tensor(t, dtype=torch.long),
            torch.tensor(tokens),
        ).numpy()

    out_f = fm.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(t, jnp.int32),
        jnp.asarray(tokens),
    )
    out_f = np.asarray(out_f).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


def test_clip_text_conversion_parity():
    """Converted HF CLIP text tower must reproduce `last_hidden_state`."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=77,
    )
    torch.manual_seed(0)
    tm = transformers.CLIPTextModel(cfg).eval()

    from v2a_tpu.models.clip_text import ClipTextEncoder

    fm = ClipTextEncoder(
        vocab_size=1000, width=64, layers=2, heads=2, mlp_dim=128,
    )
    params = convert_clip_text(tm.state_dict(), layers=2)

    rs = np.random.RandomState(0)
    ids = rs.randint(0, 1000, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0

    with torch.no_grad():
        out_t = tm(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    out_f = np.asarray(
        fm.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
        )
    )
    # padding positions produce garbage either way; compare valid tokens
    np.testing.assert_allclose(out_f[0], out_t[0], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        out_f[1, :6], out_t[1, :6], atol=2e-5, rtol=1e-4
    )


# -- reference-free layout transform checks -------------------------------


def test_weight_layout_transforms():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    # Conv2d: torch vs lax conv with HWIO kernel
    w = rs.randn(4, 3, 3, 3)
    x = rs.randn(1, 3, 8, 8)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), padding=1).numpy()
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(conv2d_w(w)),
        (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )

    # Linear
    wl = rs.randn(5, 3)
    xl = rs.randn(2, 3)
    np.testing.assert_allclose(
        xl @ linear_w(wl), xl @ wl.T, atol=1e-12
    )

    # Conv1d k=1 == Dense
    wc = rs.randn(6, 3, 1)
    np.testing.assert_allclose(
        xl @ conv1x1_to_dense(wc), xl @ wc[..., 0].T, atol=1e-12
    )

    # Conv1d k=3 layout
    w1 = rs.randn(4, 3, 3)
    x1 = rs.randn(1, 3, 10)
    ref1 = F.conv1d(torch.tensor(x1), torch.tensor(w1), padding=1).numpy()
    out1 = jax.lax.conv_general_dilated(
        jnp.asarray(x1.transpose(0, 2, 1)),
        jnp.asarray(conv1d_w(w1)),
        (1,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    np.testing.assert_allclose(
        np.asarray(out1).transpose(0, 2, 1), ref1, atol=1e-5
    )


def test_load_converted_refuses_real_text_weights_with_hash_tokenizer(tmp_path):
    """Real CLIP weights + hashing fallback tokenizer = silent garbage
    conditioning; load_converted must fail fast instead."""
    import jax
    import pytest as _pytest

    from v2a_tpu.convert.torch_import import save_video_params
    from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel

    cfg = VideoModelConfig(
        image_size=(16, 16), sample_per_seq=3, model_channels=32,
        channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(2,),
        text_dim=64,
    )
    model = VideoPredModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # with a 'text' tree and no tokenizer assets -> refuse
    path = str(tmp_path / "conv.msgpack")
    save_video_params(
        jax.tree_util.tree_map(lambda x: np.asarray(x), params), path
    )
    fresh = VideoPredModel(cfg)
    with _pytest.raises(RuntimeError, match="tokenizer"):
        fresh.load_converted(path)

    # unet-only conversion stays hermetic: random text tower + hash tokenizer
    path2 = str(tmp_path / "unet_only.msgpack")
    save_video_params(
        {"unet": jax.tree_util.tree_map(lambda x: np.asarray(x), params["unet"])},
        path2,
    )
    fresh2 = VideoPredModel(cfg)
    loaded = fresh2.load_converted(path2)
    assert "text" in loaded and not fresh2.tokenizer.is_real
