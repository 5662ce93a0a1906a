"""Full-chain sampler parity: our GaussianDiffusion vs the reference torch
`GoalGaussianDiffusion`, SAME U-Net weights, SAME x_T, var_temp=0 (fully
deterministic). This is the SURVEY §7 step-5 acceptance test — pixel-level
closeness of the whole 8-step ancestral chain and the DDIM chain, including
pred_v conversions, posterior math, clamping, and classifier-free guidance.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from v2a_tpu.convert.torch_import import convert_video_unet  # noqa: E402
from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion  # noqa: E402
from v2a_tpu.ops.schedules import DiffusionSchedule  # noqa: E402

REF = "/root/reference/flowdiffusion/flowdiffusion"

SMALL = dict(
    model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(2,), num_head_channels=32,
)


def _load_reference():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")

    # shims for reference-only deps absent here
    from tests.test_convert import _install_einops_exts_shim, shim_module

    _install_einops_exts_shim()
    if "ema_pytorch" not in sys.modules:
        m = shim_module("ema_pytorch")

        class EMA:  # only imported, not exercised by the sampler
            def __init__(self, *a, **k):
                pass

        m.EMA = EMA
        sys.modules["ema_pytorch"] = m
    if "torchvision" not in sys.modules:
        tv = shim_module("torchvision", package=True)
        tv.transforms = shim_module("torchvision.transforms")
        tv.utils = shim_module("torchvision.utils")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.utils"] = tv.utils
    if "diffuser" not in sys.modules or not hasattr(
        sys.modules.get("diffuser.utils.luo_utils", None), "batch_repeat_tensor"
    ):
        for name in ("diffuser", "diffuser.utils"):
            if name not in sys.modules:
                sys.modules[name] = shim_module(name, package=True)
        lu = shim_module("diffuser.utils.luo_utils")

        def batch_repeat_tensor(*tensors, n=2):
            import torch as _t

            *ts, n = (*tensors, n) if not isinstance(tensors[-1], int) else (
                *tensors[:-1], tensors[-1]
            )
            return [_t.cat([t] * n, dim=0) for t in ts]

        lu.batch_repeat_tensor = batch_repeat_tensor
        sys.modules["diffuser.utils.luo_utils"] = lu
    if "diffuser.models.helpers" not in sys.modules:
        if "diffuser.models" not in sys.modules:
            sys.modules["diffuser.models"] = shim_module(
                "diffuser.models", package=True
            )
        helpers = shim_module("diffuser.models.helpers")
        helpers.get_no_dash_tasks_str = lambda tasks: [
            t.replace("-", " ") for t in tasks
        ]
        sys.modules["diffuser.models.helpers"] = helpers
    if "pynvml" not in sys.modules:
        nv = shim_module("pynvml")
        nv.nvmlInit = lambda: None
        nv.nvmlDeviceGetHandleByIndex = lambda i: None
        nv.nvmlDeviceGetMemoryInfo = lambda h: types.SimpleNamespace(used=0)
        sys.modules["pynvml"] = nv

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from guided_diffusion.guided_diffusion.unet import UNetModel
    from goal_diffusion import GoalGaussianDiffusion

    return torch, UNetModel, GoalGaussianDiffusion


@pytest.fixture(scope="module")
def chains():
    torch, UNetModel, GoalGaussianDiffusion = _load_reference()
    torch.manual_seed(0)
    tm = UNetModel(
        image_size=(16, 16), in_channels=6, out_channels=3, dims=3,
        task_tokens=True, task_token_channels=64, **SMALL,
    ).eval()

    class Wrap(torch.nn.Module):
        """4D image <-> 5D single-frame video adapter (the Unet_Libero
        stacked-channel pattern at F=1, `unet.py:195-222`)."""

        def __init__(self, unet):
            super().__init__()
            self.unet = unet

        def forward(self, x, t, task_embed):
            return self.unet(x.unsqueeze(2), t, task_embed).squeeze(2)

    from v2a_tpu.models.video_unet import VideoUNet

    fm = VideoUNet(
        in_channels=6, out_channels=3, task_token_dim=64, **SMALL
    )
    params = convert_video_unet(
        tm.state_dict(), channel_mult=SMALL["channel_mult"],
        num_res_blocks=SMALL["num_res_blocks"],
        attention_resolutions=SMALL["attention_resolutions"],
    )

    def flax_model_fn(x, t, emb):
        return fm.apply(params, x, t, emb)

    return torch, GoalGaussianDiffusion, Wrap(tm), flax_model_fn


def _run_pair(chains, timesteps, sampling_timesteps, guidance_weight):
    torch, GoalGaussianDiffusion, torch_model, flax_model_fn = chains
    rs = np.random.RandomState(3)
    b, h, w = 2, 16, 16
    x_T = rs.randn(b, 3, h, w).astype(np.float32)
    x_cond = rs.rand(b, 3, h, w).astype(np.float32) * 2 - 1
    tokens = rs.randn(b, 5, 64).astype(np.float32)

    tdiff = GoalGaussianDiffusion(
        torch_model, image_size=(h, w), channels=3, timesteps=timesteps,
        sampling_timesteps=sampling_timesteps, objective="pred_v",
        beta_schedule="cosine", min_snr_loss_weight=True,
        guidance_weight=guidance_weight, var_temp=0.0, loss_type="l2",
    ).eval()

    orig_randn = torch.randn

    def fixed_randn(*shape, **kw):
        if tuple(shape) == (b, 3, h, w) or (
            len(shape) == 1 and tuple(shape[0]) == (b, 3, h, w)
        ):
            return torch.tensor(x_T)
        return orig_randn(*shape, **kw)

    torch.randn = fixed_randn
    try:
        with torch.no_grad():
            if tdiff.is_ddim_sampling:
                out_t = tdiff.ddim_sample(
                    (b, 3, h, w), torch.tensor(x_cond),
                    torch.tensor(tokens),
                ).numpy()
            else:
                out_t = tdiff.p_sample_loop(
                    (b, 3, h, w), torch.tensor(x_cond), torch.tensor(tokens)
                ).numpy()
    finally:
        torch.randn = orig_randn

    fdiff = GaussianDiffusion(
        schedule=DiffusionSchedule.create(timesteps, "cosine"),
        objective="pred_v", sampling_timesteps=sampling_timesteps,
        guidance_weight=guidance_weight, var_temp=0.0,
    )
    shape = (b, 1, h, w, 3)
    init = jnp.asarray(x_T.transpose(0, 2, 3, 1)[:, None])
    x_cond_f = jnp.asarray(x_cond.transpose(0, 2, 3, 1)[:, None])
    fn = fdiff.ddim_sample if fdiff.is_ddim_sampling else fdiff.p_sample_loop
    out_f = fn(
        flax_model_fn, jax.random.PRNGKey(0), shape, x_cond_f,
        jnp.asarray(tokens), init_noise=init,
    )
    out_f = np.asarray(out_f)[:, 0].transpose(0, 3, 1, 2)
    return out_t, out_f


def test_ancestral_chain_parity(chains):
    out_t, out_f = _run_pair(chains, timesteps=8, sampling_timesteps=8,
                             guidance_weight=0.0)
    np.testing.assert_allclose(out_f, out_t, atol=5e-3, rtol=1e-2)


def test_ddim_chain_parity(chains):
    out_t, out_f = _run_pair(chains, timesteps=8, sampling_timesteps=4,
                             guidance_weight=0.0)
    np.testing.assert_allclose(out_f, out_t, atol=5e-3, rtol=1e-2)


def test_cfg_chain_parity(chains):
    """Classifier-free guidance path (batch doubling, epsilon-space
    combination for pred_v, `goal_diffusion.py:499-548`)."""
    out_t, out_f = _run_pair(chains, timesteps=8, sampling_timesteps=8,
                             guidance_weight=1.5)
    np.testing.assert_allclose(out_f, out_t, atol=5e-3, rtol=1e-2)
