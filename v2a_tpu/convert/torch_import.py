"""Torch -> JAX checkpoint conversion for the frozen video model stack.

Converts the reference's `model-{milestone}.pt` video checkpoints (an
`ema_pytorch.EMA` state dict around `GoalGaussianDiffusion(Unet_Libero(
UNetModel))`, loaded at `diffuser/models/video_model.py:38-46`) and the HF
CLIP text tower into the v2a_tpu flax parameter trees. Weight-layout
transforms:

    torch Linear   (O, I)        -> flax Dense kernel (I, O)
    torch Conv2d   (O, I, kh, kw)-> flax Conv kernel (kh, kw, I, O)
    torch Conv1d   (O, I, k)     -> flax Conv kernel (k, I, O)
    torch Conv1d k=1 (attn qkv/proj) -> flax Dense kernel (I, O)
    GroupNorm/LayerNorm weight/bias  -> scale/bias
    Embedding weight              -> table, unchanged

The structural enumeration (which `input_blocks.{i}` index is which flax
module name) replays the U-Net constructor loops of
`guided_diffusion/guided_diffusion/unet.py:404-684` exactly, parameterized
by (channel_mult, num_res_blocks, attention_resolutions). Conversion
fidelity is covered by golden parity tests that run the reference torch
model (when importable) and the flax model on identical inputs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import numpy as np

from v2a_tpu.models.video_model import VideoModelConfig


# -- primitive transforms --------------------------------------------------


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def linear_w(w) -> np.ndarray:
    return _np(w).T


def conv2d_w(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def conv1d_w(w) -> np.ndarray:
    return _np(w).transpose(2, 1, 0)


def conv1x1_to_dense(w) -> np.ndarray:
    return _np(w)[..., 0].T


def _norm(sd, p) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def _dense(sd, p, bias=True) -> Dict[str, np.ndarray]:
    out = {"kernel": linear_w(sd[f"{p}.weight"])}
    if bias and f"{p}.bias" in sd:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


# -- module-level converters ----------------------------------------------


def convert_pseudo_conv(sd, p) -> Dict[str, Any]:
    """`Conv3d` = spatial Conv2d + optional temporal Conv1d (`nn.py:30-88`)."""
    out: Dict[str, Any] = {
        "spatial_conv": {
            "kernel": conv2d_w(sd[f"{p}.spatial_conv.weight"]),
            "bias": _np(sd[f"{p}.spatial_conv.bias"]),
        }
    }
    if f"{p}.temporal_conv.weight" in sd:
        out["temporal_conv"] = {
            "kernel": conv1d_w(sd[f"{p}.temporal_conv.weight"]),
            "bias": _np(sd[f"{p}.temporal_conv.bias"]),
        }
    return out


def convert_resblock(sd, p) -> Dict[str, Any]:
    out = {
        "in_norm": _norm(sd, f"{p}.in_layers.0"),
        "in_conv": convert_pseudo_conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "out_norm": _norm(sd, f"{p}.out_layers.0"),
        "out_conv": convert_pseudo_conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.spatial_conv.weight" in sd:
        out["skip_conv"] = convert_pseudo_conv(sd, f"{p}.skip_connection")
    return out


def convert_attention(sd, p) -> Dict[str, Any]:
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "qkv": {
            "kernel": conv1x1_to_dense(sd[f"{p}.qkv.weight"]),
            "bias": _np(sd[f"{p}.qkv.bias"]),
        },
        "proj_out": {
            "kernel": conv1x1_to_dense(sd[f"{p}.proj_out.weight"]),
            "bias": _np(sd[f"{p}.proj_out.bias"]),
        },
    }


def convert_perceiver(sd, p, depth: int = 2) -> Dict[str, Any]:
    """`PerceiverResampler` (`imagen.py:321-372`)."""
    out: Dict[str, Any] = {
        "latents": _np(sd[f"{p}.latents"]),
        "pos_emb": _np(sd[f"{p}.pos_emb.weight"]),
        "pool_norm": {"g": _np(sd[f"{p}.to_latents_from_mean_pooled_seq.0.g"])},
        "pool_proj": _dense(sd, f"{p}.to_latents_from_mean_pooled_seq.1"),
    }
    for i in range(depth):
        a = f"{p}.layers.{i}.0"
        out[f"attn_{i}"] = {
            "norm": _norm(sd, f"{a}.norm"),
            "norm_latents": _norm(sd, f"{a}.norm_latents"),
            "to_q": _dense(sd, f"{a}.to_q", bias=False),
            "to_kv": _dense(sd, f"{a}.to_kv", bias=False),
            "q_scale": _np(sd[f"{a}.q_scale"]),
            "k_scale": _np(sd[f"{a}.k_scale"]),
            "to_out": _dense(sd, f"{a}.to_out.0", bias=False),
            "out_norm": _norm(sd, f"{a}.to_out.1"),
        }
        f = f"{p}.layers.{i}.1"
        out[f"ff_{i}"] = {
            "norm_in": {"g": _np(sd[f"{f}.0.g"])},
            "dense_in": _dense(sd, f"{f}.1", bias=False),
            "norm_hidden": {"g": _np(sd[f"{f}.3.g"])},
            "dense_out": _dense(sd, f"{f}.4", bias=False),
        }
    return out


# -- the full video U-Net --------------------------------------------------


def convert_video_unet(
    sd: Dict[str, Any],
    channel_mult: Sequence[int] = (1, 2, 3, 4, 5),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (8, 16),
    perceiver_depth: int = 2,
) -> Dict[str, Any]:
    """Map a torch `UNetModel` state dict (keys relative to the model root)
    onto the `VideoUNet` flax param tree."""
    p: Dict[str, Any] = {}
    p["time_dense0"] = _dense(sd, "time_embed.0")
    p["time_dense1"] = _dense(sd, "time_embed.2")
    if "task_attnpool.0.latents" in sd:
        p["task_attnpool"] = convert_perceiver(
            sd, "task_attnpool.0", perceiver_depth
        )
        p["task_proj"] = _dense(sd, "task_attnpool.1")

    p["in_conv"] = convert_pseudo_conv(sd, "input_blocks.0.0")

    # -- down path (constructor loop `unet.py:532-582`)
    tidx = 1
    block_idx = 0
    ds = 1
    last = len(channel_mult) - 1
    for level in range(len(channel_mult)):
        for _ in range(num_res_blocks):
            p[f"down_res_{block_idx}"] = convert_resblock(
                sd, f"input_blocks.{tidx}.0"
            )
            if ds in attention_resolutions:
                p[f"down_attn_{block_idx}"] = convert_attention(
                    sd, f"input_blocks.{tidx}.1"
                )
            tidx += 1
            block_idx += 1
        if level != last:
            p[f"downsample_{level}"] = {
                "conv": convert_pseudo_conv(sd, f"input_blocks.{tidx}.0.op")
            }
            tidx += 1
            ds *= 2

    p["mid_res0"] = convert_resblock(sd, "middle_block.0")
    p["mid_attn"] = convert_attention(sd, "middle_block.1")
    p["mid_res1"] = convert_resblock(sd, "middle_block.2")

    # -- up path (constructor loop `unet.py:610-648`)
    tidx = 0
    block_idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            p[f"up_res_{block_idx}"] = convert_resblock(
                sd, f"output_blocks.{tidx}.0"
            )
            sub = 1
            if ds in attention_resolutions:
                p[f"up_attn_{block_idx}"] = convert_attention(
                    sd, f"output_blocks.{tidx}.{sub}"
                )
                sub += 1
            if level and i == num_res_blocks:
                p[f"upsample_{level}"] = {
                    "conv": convert_pseudo_conv(
                        sd, f"output_blocks.{tidx}.{sub}.conv"
                    )
                }
                ds //= 2
            tidx += 1
            block_idx += 1

    p["out_norm"] = _norm(sd, "out.0")
    p["out_conv"] = convert_pseudo_conv(sd, "out.2")
    return {"params": p}


def extract_unet_state(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """Pull the EMA U-Net weights out of a full `model-{milestone}.pt` dict
    (`Video_PredModel.load` consumes `ckpt['ema']` whose U-Net lives under
    `ema_model.model.unet.*` — `video_model.py:38-46`)."""
    sd = ckpt.get("ema", ckpt)
    prefix = "ema_model.model.unet."
    out = {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }
    if not out:  # maybe already unet-rooted
        out = {k: v for k, v in sd.items() if k.startswith("input_blocks")}
        if out:
            return dict(sd)
        raise KeyError(
            "could not locate U-Net weights; expected keys under "
            f"'{prefix}'"
        )
    return out


# -- CLIP text tower -------------------------------------------------------


def convert_clip_text(sd: Dict[str, Any], layers: int = 12) -> Dict[str, Any]:
    """HF `CLIPTextModel` state dict -> `ClipTextEncoder` params."""
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    p: Dict[str, Any] = {
        "token_embedding": {
            "embedding": _np(sd[f"{pre}embeddings.token_embedding.weight"])
        },
        "position_embedding": _np(
            sd[f"{pre}embeddings.position_embedding.weight"]
        ),
        "final_ln": _norm(sd, f"{pre}final_layer_norm"),
    }
    for i in range(layers):
        b = f"{pre}encoder.layers.{i}"
        p[f"block_{i}"] = {
            "ln1": _norm(sd, f"{b}.layer_norm1"),
            "ln2": _norm(sd, f"{b}.layer_norm2"),
            "q": _dense(sd, f"{b}.self_attn.q_proj"),
            "k": _dense(sd, f"{b}.self_attn.k_proj"),
            "v": _dense(sd, f"{b}.self_attn.v_proj"),
            "proj": _dense(sd, f"{b}.self_attn.out_proj"),
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
    return {"params": p}


# -- serialization ---------------------------------------------------------


def save_video_params(params: Dict[str, Any], path: str):
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))


def load_video_params(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def convert_video_checkpoint(
    pt_path: str,
    out_path: str,
    config: Optional[VideoModelConfig] = None,
    clip_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Full conversion entry: torch .pt (+ optional local HF CLIP weights)
    -> one msgpack with {'unet': ..., 'text': ...}."""
    import torch

    cfg = config or VideoModelConfig()
    ckpt = torch.load(pt_path, map_location="cpu")
    unet_sd = extract_unet_state(ckpt)
    params = {
        "unet": convert_video_unet(
            unet_sd,
            channel_mult=tuple(cfg.channel_mult),
            num_res_blocks=cfg.num_res_blocks,
            attention_resolutions=tuple(cfg.attention_resolutions),
        )
    }
    if clip_path:
        clip_sd = torch.load(
            os.path.join(clip_path, "pytorch_model.bin"), map_location="cpu"
        )
        params["text"] = convert_clip_text(clip_sd)
        # Bundle the tokenizer assets next to the converted weights: real
        # CLIP weights with the hashing fallback tokenizer would silently
        # produce garbage conditioning (VideoPredModel.load_converted
        # refuses that combination).
        import shutil

        tok_dir = os.path.join(os.path.dirname(out_path) or ".", "tokenizer")
        os.makedirs(tok_dir, exist_ok=True)
        copied = 0
        for name in (
            "vocab.json", "merges.txt", "tokenizer.json",
            "tokenizer_config.json", "special_tokens_map.json",
        ):
            src = os.path.join(clip_path, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(tok_dir, name))
                copied += 1
        if copied == 0:
            raise FileNotFoundError(
                f"no tokenizer assets (vocab.json/merges.txt) in {clip_path}"
                " — converted CLIP weights require the real tokenizer"
            )
    save_video_params(params, out_path)
    return params


# -- diffusion policy (trained) -------------------------------------------
#
# Trainer checkpoints (`model-{milestone}.pt`, `lb_online_trainer_v7.py:
# 364-383`) hold the policy twice: `gcp_model` (online weights) and
# `ema.ema_model.*` (the EMA used for rollout/eval). Both are
# `DiffusionUnetImagePolicy` state dicts with submodules `obs_encoder`
# (MultiImageObsEncoder) and `model` (ConditionalUnet1D).


def convtranspose1d_w(w) -> np.ndarray:
    """torch ConvTranspose1d weight (in, out, k) -> flax ConvTranspose
    kernel (k, in, out) with the tap axis flipped (verified by dirac-probe
    equality tests)."""
    return np.ascontiguousarray(_np(w).transpose(2, 0, 1)[::-1])


def _conv1d(sd, p) -> Dict[str, np.ndarray]:
    return {
        "kernel": conv1d_w(sd[f"{p}.weight"]),
        "bias": _np(sd[f"{p}.bias"]),
    }


def _unet1d_resblock(sd, p) -> Dict[str, Any]:
    """`ConditionalResidualBlock1D` (`conditional_unet1d.py:14-66`)."""
    out = {
        "block0": {
            "conv": _conv1d(sd, f"{p}.blocks.0.block.0"),
            "norm": _norm(sd, f"{p}.blocks.0.block.1"),
        },
        "block1": {
            "conv": _conv1d(sd, f"{p}.blocks.1.block.0"),
            "norm": _norm(sd, f"{p}.blocks.1.block.1"),
        },
        "cond_encoder": _dense(sd, f"{p}.cond_encoder.1"),
    }
    if f"{p}.residual_conv.weight" in sd:
        out["residual_conv"] = _conv1d(sd, f"{p}.residual_conv")
    return out


def convert_unet1d(
    sd: Dict[str, Any], down_dims: Sequence[int] = (256, 512, 1024)
) -> Dict[str, Any]:
    """torch `ConditionalUnet1D` state dict (keys relative to the net) ->
    flax `ConditionalUnet1D` params."""
    p: Dict[str, Any] = {
        "time_dense0": _dense(sd, "diffusion_step_encoder.1"),
        "time_dense1": _dense(sd, "diffusion_step_encoder.3"),
        "mid_res0": _unet1d_resblock(sd, "mid_modules.0"),
        "mid_res1": _unet1d_resblock(sd, "mid_modules.1"),
        "final_block": {
            "conv": _conv1d(sd, "final_conv.0.block.0"),
            "norm": _norm(sd, "final_conv.0.block.1"),
        },
        "final_conv": _conv1d(sd, "final_conv.1"),
    }
    n_levels = len(down_dims)
    for lv in range(n_levels):
        p[f"down_{lv}_res0"] = _unet1d_resblock(sd, f"down_modules.{lv}.0")
        p[f"down_{lv}_res1"] = _unet1d_resblock(sd, f"down_modules.{lv}.1")
        if f"down_modules.{lv}.2.conv.weight" in sd:
            p[f"down_{lv}_downsample"] = {
                "conv": _conv1d(sd, f"down_modules.{lv}.2.conv")
            }
    for lv in range(n_levels - 1):
        p[f"up_{lv}_res0"] = _unet1d_resblock(sd, f"up_modules.{lv}.0")
        p[f"up_{lv}_res1"] = _unet1d_resblock(sd, f"up_modules.{lv}.1")
        p[f"up_{lv}_upsample"] = {
            "conv": {
                "kernel": convtranspose1d_w(sd[f"up_modules.{lv}.2.conv.weight"]),
                "bias": _np(sd[f"up_modules.{lv}.2.conv.bias"]),
            }
        }
    return p


_RESNET_STAGE = {4: "layer1", 5: "layer2", 6: "layer3", 7: "layer4"}


def _resnet_basic_block(sd, p) -> Dict[str, Any]:
    out = {
        "conv1": {"kernel": conv2d_w(sd[f"{p}.conv1.weight"])},
        "norm1": _norm(sd, f"{p}.bn1"),
        "conv2": {"kernel": conv2d_w(sd[f"{p}.conv2.weight"])},
        "norm2": _norm(sd, f"{p}.bn2"),
    }
    if f"{p}.downsample.0.weight" in sd:
        out["downsample_conv"] = {
            "kernel": conv2d_w(sd[f"{p}.downsample.0.weight"])
        }
        out["downsample_norm"] = _norm(sd, f"{p}.downsample.1")
    return out


def convert_visual_core(sd: Dict[str, Any], p: str) -> Dict[str, Any]:
    """One robomimic `VisualCore` = ResNet18Conv -> SpatialSoftmax ->
    flatten -> Linear (`vision_nets.py:65-177`). Keys relative to the
    VisualCore root: `nets.0.nets.{i}` trunk, `nets.1.nets` keypoint conv,
    `nets.3` linear. BatchNorms were replaced by GroupNorm post-hoc in the
    reference (`multi_image_obs_encoder.py:66-77`) so bn* keys hold GN
    scale/bias."""
    backbone: Dict[str, Any] = {
        "conv1": {"kernel": conv2d_w(sd[f"{p}.nets.0.nets.0.weight"])},
        "norm1": _norm(sd, f"{p}.nets.0.nets.1"),
    }
    for idx, stage in _RESNET_STAGE.items():
        for blk in (0, 1):
            backbone[f"{stage}_{blk}"] = _resnet_basic_block(
                sd, f"{p}.nets.0.nets.{idx}.{blk}"
            )
    return {
        "backbone": backbone,
        "pool": {
            "kp_conv": {
                "kernel": conv2d_w(sd[f"{p}.nets.1.nets.weight"]),
                "bias": _np(sd[f"{p}.nets.1.nets.bias"]),
            }
        },
        "proj": _dense(sd, f"{p}.nets.3"),
    }


def convert_policy(
    sd: Dict[str, Any],
    obs_keys: Sequence[str] = ("img_obs_1", "img_goal_1"),
    down_dims: Sequence[int] = (256, 512, 1024),
) -> Dict[str, Any]:
    """torch `DiffusionUnetImagePolicy` state dict -> flax `PolicyNets`
    params (the tree `DiffusionPolicy.init` produces)."""
    unet_sd = {
        k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")
    }
    p: Dict[str, Any] = {"unet": convert_unet1d(unet_sd, down_dims)}
    enc: Dict[str, Any] = {}
    for key in obs_keys:
        enc[f"enc_{key}"] = convert_visual_core(
            sd, f"obs_encoder.key_model_map.{key}"
        )
    p["obs_encoder"] = enc
    return {"params": p}


def extract_policy_state(
    ckpt: Dict[str, Any], use_ema: bool = True
) -> Dict[str, Any]:
    """Pull the policy weights out of a trainer `model-{milestone}.pt`
    (`lb_online_trainer_v7.py:364-383`)."""
    if use_ema and "ema" in ckpt:
        sd = ckpt["ema"]
        prefix = "ema_model."
        out = {
            k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
        }
        if out:
            return out
    if "gcp_model" in ckpt:
        return dict(ckpt["gcp_model"])
    return dict(ckpt)
